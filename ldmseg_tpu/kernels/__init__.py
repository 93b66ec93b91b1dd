from .attention import multi_head_attention, mha_reference, flash_attention
from .norms import group_norm_silu

__all__ = [
    "multi_head_attention",
    "mha_reference",
    "flash_attention",
    "group_norm_silu",
]
