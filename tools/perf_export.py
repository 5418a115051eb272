#!/usr/bin/env python3
"""Exported-artifact serving cost vs the in-process jitted forward.

Answers "does AOT export (sonet_tpu/serving.py) tax serving?": runs the
modelnet40 eval forward at the production config (B=8, N=5000, bf16)
both as the in-process ``jax.jit`` program and as a
serialize->deserialize ``jax.export`` roundtrip, timing the per-request
serving pattern (dispatch + fetch every response — what an HTTP daemon
pays per request; CLAUDE.md: only fetches synchronize on this backend).

Prints one JSON line; the measured numbers are recorded in
docs/SERVING.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, arrays, iters=50):
    np.asarray(fn(*arrays))  # warmup (compile) + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn(*arrays))  # fetch = the per-request sync
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from sonet_tpu import config as cfg_mod
    from sonet_tpu.models import build_model
    from sonet_tpu.serving import build_serve_fn, input_signature

    cfg = cfg_mod.modelnet40().replace(mesh_shape=(1, 1))
    model = build_model(cfg)
    sig = input_signature(cfg)
    rs = np.random.RandomState(0)
    arrays = [jnp.asarray(rs.randn(*s).astype(d)) for _, s, d in sig]
    variables = model.init({"params": jax.random.PRNGKey(0)}, *arrays,
                           train=False)
    serve = build_serve_fn(model, cfg, variables["params"],
                           variables.get("batch_stats", {}))

    in_ms, want = bench(jax.jit(serve), arrays)

    exported = jexport.export(jax.jit(serve))(
        *(jax.ShapeDtypeStruct(s, d) for _, s, d in sig))
    blob = exported.serialize()
    rt = jexport.deserialize(bytearray(blob))
    ex_ms, got = bench(rt.call, arrays)

    B = cfg.batch_size
    print(json.dumps({
        "config": f"modelnet40 eval fwd B={B} N={cfg.input_pc_num}",
        "in_process_ms": round(in_ms * 1e3, 3),
        "exported_ms": round(ex_ms * 1e3, 3),
        "export_overhead": round(ex_ms / in_ms - 1, 4),
        "in_process_clouds_per_sec": round(B / in_ms, 1),
        "exported_clouds_per_sec": round(B / ex_ms, 1),
        "blob_mb": round(len(blob) / 2**20, 2),
        "max_abs_diff": float(np.max(np.abs(np.asarray(got, np.float32)
                                            - np.asarray(want, np.float32)))),
    }))


if __name__ == "__main__":
    main()
