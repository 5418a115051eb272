"""Batched Self-Organizing Map (L1 of SURVEY.md §1) — on-TPU, functional."""

from .potential_field import potential_field_nodes
from .som import (
    SOMConfig,
    init_nodes,
    batch_update,
    fit,
    query,
    query_topk,
)

__all__ = [
    "potential_field_nodes", "SOMConfig", "init_nodes", "batch_update",
    "fit", "query", "query_topk",
]
