from .vae_seg import SegVAE, SegVAEConfig, SegEncoder, SegDecoder
from .vae_sd import SDVAE, SDVAEConfig
from .unet import CondUNet, UNetConfig, tiny_unet_config
from .upscaler import Upscaler, UpscalerConfig

__all__ = [
    "SegVAE",
    "SegVAEConfig",
    "SegEncoder",
    "SegDecoder",
    "SDVAE",
    "SDVAEConfig",
    "CondUNet",
    "UNetConfig",
    "tiny_unet_config",
    "Upscaler",
    "UpscalerConfig",
]
