from .image import nearest_resize_torch, nearest_downsample
from .meters import AverageMeter, ProgressMeter
from .logging import Logger

__all__ = [
    "nearest_resize_torch",
    "nearest_downsample",
    "AverageMeter",
    "ProgressMeter",
    "Logger",
]
