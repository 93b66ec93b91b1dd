from .point_losses import (
    SegLossConfig,
    point_sample,
    uncertain_point_coords,
    segmentation_point_loss,
)

__all__ = [
    "SegLossConfig",
    "point_sample",
    "uncertain_point_coords",
    "segmentation_point_loss",
]
