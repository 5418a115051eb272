"""Profiling / debugging hooks (SURVEY.md §5: the reference has none).

* ``trace(dir)`` — context manager around ``jax.profiler`` for capturing
  a TPU trace viewable in TensorBoard/Perfetto.
* ``enable_nan_checks()`` — the JAX analogue of a sanitizer for this
  functional world: every jitted op re-checked for NaNs.
* ``diagnose_grads`` — mean absolute gradient per top-level subnetwork,
  the reference's ``diagnose_network`` (util/util.py) equivalent.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", True)


def diagnose_grads(grads: Any) -> Dict[str, float]:
    out = {}
    for name, sub in grads.items():
        leaves = jax.tree_util.tree_leaves(sub)
        if not leaves:
            continue
        total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
        count = sum(x.size for x in leaves)
        out[name] = total / max(count, 1)
    return out
