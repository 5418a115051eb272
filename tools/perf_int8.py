#!/usr/bin/env python3
"""Is int8 worth it on this chip? Measured int8-vs-bf16 matmul probe.

v5e peak is 394 TOPS int8 vs 197 TFLOPS bf16 — IF XLA lowers an
int8xint8->int32 dot to the MXU's int8 mode.  This measures the
encoder's hottest GEMM shape both ways to size a quantized inference
path BEFORE building it.

Measurement notes (hard-won):
* differenced scan_bench timings of sub-ms ops drown in axon-tunnel
  wall noise — use long absolute scans (R=2000) instead;
* the loop body must CONSUME THE FULL OUTPUT (jnp.sum(o) into the
  carry): with only o[0,0] consumed, XLA narrows the int8 dot and
  reports a fictitious 4.3x.

Measured 2026-08-17 (R=2000, best of 3):
    (120000,256)x(256,384)  bf16 0.2432 ms/iter ( 97 TF/s)
                            int8 0.1610 ms/iter (147 TOP/s)  -> 1.51x
Decision: int8 inference is a ~1.5x lever on the GEMM fraction only
(~half the inference step) => ~1.2x end-to-end, against per-channel
quantization machinery + accuracy risk on the 3356-ch segmenter concat.
Recorded as closed in docs/DESIGN.md; revisit only if serving becomes
MXU-bound end-to-end.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe(M, K, N, R):
    rs = np.random.RandomState(0)
    a_bf = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    b_bf = jnp.asarray(rs.randn(K, N), jnp.bfloat16)
    a_i8 = jnp.asarray(rs.randint(-127, 127, (M, K)), jnp.int8)
    b_i8 = jnp.asarray(rs.randint(-127, 127, (K, N)), jnp.int8)

    @jax.jit
    def bf16_prog():
        def body(c, _):
            x = a_bf.at[0, 0].set(c)
            o = jax.lax.dot_general(x, b_bf, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.sum(o).astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=R)
        return c.astype(jnp.float32)

    @jax.jit
    def int8_prog():
        def body(c, _):
            x = a_i8.at[0, 0].set(c)
            o = jax.lax.dot_general(x, b_i8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (jnp.sum(o) & 127).astype(jnp.int8), None
        c, _ = jax.lax.scan(body, jnp.int8(0), None, length=R)
        return c.astype(jnp.float32)

    def best_of(prog, n=3):
        _ = float(prog())  # compile + warm
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            _ = float(prog())  # fetch = the only real sync on axon
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    fl = 2 * M * K * N * R
    t_bf = best_of(bf16_prog)
    t_i8 = best_of(int8_prog)
    print(f"({M},{K})x({K},{N}) R={R}")
    print(f"  bf16 {t_bf/R*1e3:.4f} ms/iter ({fl/t_bf/1e12:6.1f} TF/s)")
    print(f"  int8 {t_i8/R*1e3:.4f} ms/iter ({fl/t_i8/1e12:6.1f} TOP/s)")
    print(f"  speedup {t_bf/t_i8:.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()
    print("devices:", jax.devices())
    # the encoder's hottest GEMM (kN=15000 stacked points at B=8)
    probe(8 * 15000, 256, 384, args.iters)


if __name__ == "__main__":
    main()
