from .semseg import SemsegMeter
from .postprocess import panoptic_decode, filter_segments
from .panoptic import (
    PQStat,
    pq_compute_single,
    offline_pq_compute,
    PanopticEvaluator,
)

__all__ = [
    "SemsegMeter",
    "panoptic_decode",
    "filter_segments",
    "PQStat",
    "pq_compute_single",
    "offline_pq_compute",
    "PanopticEvaluator",
]
