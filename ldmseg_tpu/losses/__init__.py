from .point_losses import (
    SegLossConfig,
    hungarian_match,
    matched_segmentation_loss,
    point_sample,
    uncertain_point_coords,
    segmentation_point_loss,
)

__all__ = [
    "SegLossConfig",
    "point_sample",
    "uncertain_point_coords",
    "segmentation_point_loss",
    "hungarian_match",
    "matched_segmentation_loss",
]
