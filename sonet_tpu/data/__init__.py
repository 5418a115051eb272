"""Data pipeline (L2 of SURVEY.md §1): loaders, augmentation, prep."""

from . import augmentation
from .pipeline import BatchLoader, collate
from .synthetic import SyntheticDataset
from .h5 import load_h5, load_h5_data_label_seg
from .sampler import (
    read_obj,
    sample_mesh,
    normalize_cloud,
    farthest_point_sampling,
    farthest_point_sampling_jax,
)

__all__ = [
    "augmentation", "BatchLoader", "collate", "SyntheticDataset",
    "read_obj", "sample_mesh", "normalize_cloud",
    "load_h5", "load_h5_data_label_seg",
    "farthest_point_sampling", "farthest_point_sampling_jax",
]
