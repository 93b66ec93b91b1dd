from .vae_seg import SegVAE, SegVAEConfig, SegEncoder, SegDecoder

__all__ = [
    "SegVAE",
    "SegVAEConfig",
    "SegEncoder",
    "SegDecoder",
]
