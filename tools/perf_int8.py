#!/usr/bin/env python3
"""Is int8 worth it on this chip? Microbenchmark int8 vs bf16 matmul.

v5e peak is 394 TOPS int8 vs 197 TFLOPS bf16 — IF XLA lowers an
int8xint8->int32 dot to the MXU's int8 mode. This measures the
encoder-shaped GEMMs (kN=15000 points x channel widths) both ways to
decide whether a quantized inference path is a real lever before
building it.

Usage: python tools/perf_int8.py [--iters 30]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sonet_tpu.utils.profiling import scan_bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    shapes = [
        # (M, K, N): encoder hot GEMMs at B=8, kN=15000 stacked points
        (8 * 15000, 64, 128),
        (8 * 15000, 128, 256),
        (8 * 15000, 256, 384),
        (8 * 64, 387, 512),     # knn layer per-node
        (8 * 64, 515, 768),
        (8 * 64, 768, 1024),
    ]
    rs = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    for (m, k, n) in shapes:
        a = jnp.asarray(rs.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(rs.randn(k, n), jnp.bfloat16)
        ai = jnp.asarray(rs.randint(-127, 127, (m, k)), jnp.int8)
        bi = jnp.asarray(rs.randint(-127, 127, (k, n)), jnp.int8)

        def mm_bf16(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def mm_int8(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        t_bf = scan_bench(mm_bf16, (a, b), iters=args.iters)
        t_i8 = scan_bench(mm_int8, (ai, bi), iters=args.iters)
        fl = 2 * m * k * n
        print(f"({m:7d},{k:4d},{n:4d})  bf16 {t_bf*1e3:7.3f} ms "
              f"({fl/t_bf/1e12:6.1f} TF/s)   int8 {t_i8*1e3:7.3f} ms "
              f"({fl/t_i8/1e12:6.1f} TOP/s)   speedup {t_bf/t_i8:5.2f}x")


if __name__ == "__main__":
    main()
