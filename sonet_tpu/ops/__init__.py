"""Geometry / reduction ops — the L0/L1 kernel layer (SURVEY.md §1).

Every op has a pure-XLA implementation here; hot ones get fused Pallas
TPU kernels under ``sonet_tpu.ops.pallas`` behind the same API, and a
C++ FFI reference lives in ``sonet_tpu/native`` for cross-checking.
"""

from .pairwise import pairwise_sqdist, knn, assign_topk, one_hot_f32, TopKAssign
from .segment import (
    segment_max,
    segment_max_onehot,
    segment_max_scatter,
    segment_counts,
    segment_sum_onehot,
    segment_mean_onehot,
)
from .segment_sorted import segment_max_sorted, sort_by_segment
from .segment_fast import segment_max_fast
from .gather import knn_gather, gather_by_segment, permute_points
from .chamfer import chamfer, robust_norm, ChamferResult
from .iou import compute_iou, iou_per_shape, PART_LABEL, PART_TABLE

__all__ = [
    "pairwise_sqdist", "knn", "assign_topk", "one_hot_f32", "TopKAssign",
    "segment_max", "segment_max_onehot", "segment_max_scatter",
    "segment_counts", "segment_sum_onehot", "segment_mean_onehot",
    "segment_max_sorted", "sort_by_segment", "segment_max_fast",
    "knn_gather", "gather_by_segment", "permute_points",
    "chamfer", "robust_norm", "ChamferResult",
    "compute_iou", "iou_per_shape", "PART_LABEL", "PART_TABLE",
]
