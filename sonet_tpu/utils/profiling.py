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


def scan_bench(f, args, iters: int = 50, name: str = "") -> float:
    """Per-op timing free of dispatch/tunnel overhead: loops the op inside
    ONE jitted program (`lax.scan`) and synchronizes with a real data
    fetch (on remote backends `block_until_ready` can return before
    execution completes).  A loop-carried epsilon perturbs the first
    float argument to defeat loop-invariant hoisting.
    """
    import time

    def run(R):
        def body(c, _):
            perturbed, done = [], False
            for a in args:
                if not done and jnp.issubdtype(a.dtype, jnp.floating):
                    perturbed.append(a + c * 1e-30)
                    done = True
                else:
                    perturbed.append(a)
            out = f(*perturbed)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.ravel()[0].astype(jnp.float32) * 1e-30, None

        @jax.jit
        def prog():
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
            return c

        _ = float(prog())  # compile + run
        t0 = time.perf_counter()
        _ = float(prog())
        return time.perf_counter() - t0

    t_small = run(2)
    t_big = run(2 + iters)
    dt = (t_big - t_small) / iters
    if name:
        print(f"{name}: {dt*1e3:.3f} ms/iter")
    return dt


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
