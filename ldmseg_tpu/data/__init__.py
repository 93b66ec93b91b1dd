from .encodings import (
    color_map,
    encode_bitmap,
    decode_bitmap,
    encode_bitmap_jnp,
    decode_bitmap_jnp,
    remap_labels,
    encode_semseg_color,
    encode_semseg_random_color,
)
from .mask_generator import MaskingGenerator

__all__ = [
    "color_map",
    "encode_bitmap",
    "decode_bitmap",
    "encode_bitmap_jnp",
    "decode_bitmap_jnp",
    "remap_labels",
    "encode_semseg_color",
    "encode_semseg_random_color",
    "MaskingGenerator",
]
