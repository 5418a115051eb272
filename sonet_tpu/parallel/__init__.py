"""Mesh / sharding utilities (no reference equivalent — the reference is
single-GPU only, SURVEY.md §2.3)."""

from .mesh import (make_mesh, mesh_for_config, batch_specs, shard_batch,
                   shard_stacked, replicate,
                   parse_mesh_shape, normalize_mesh_shape,
                   check_mesh_divisible)
from .distributed import (maybe_init_distributed, parse_distributed_spec,
                          is_main, fetch_global, process_count, sync)

__all__ = ["make_mesh", "mesh_for_config", "batch_specs", "shard_batch",
           "shard_stacked", "replicate",
           "parse_mesh_shape", "normalize_mesh_shape",
           "check_mesh_divisible",
           "maybe_init_distributed", "parse_distributed_spec", "is_main",
           "fetch_global", "process_count", "sync"]
