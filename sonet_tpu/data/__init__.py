"""Data pipeline (L2 of SURVEY.md §1): loaders, augmentation, prep."""

from . import augmentation
from .pipeline import BatchLoader, collate
from .synthetic import SyntheticDataset

__all__ = ["augmentation", "BatchLoader", "collate", "SyntheticDataset"]
