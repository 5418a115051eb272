#!/usr/bin/env python3
"""Name the flagship classify step's device-time tail (VERDICT r2 #5).

Runs the production ModelNet40 train step (same construction as
bench.py) under the jax.profiler device lane, then joins each profiled
op (fusion.N / sort.N / the Pallas pooling custom call) with the
compiled HLO to say WHAT each fusion computes: its output shape and
the operation mix inside its fused computation.  Prints a markdown
table of the top-K ops for docs/DESIGN.md.

    python tools/perf_fusions.py [--top 12] [--iters 10]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sonet_tpu.utils.hlocat import (categorize, named_ops,
                                    parse_hlo_fusions, summarize_mix)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--task", default="classify",
                    help="any bench.py task (classify, segment, "
                         "autoencode, classify_infer_b64) — built with "
                         "the exact bench construction")
    args = ap.parse_args()

    from sonet_tpu.utils.tprof import device_time
    from bench import _build_task  # same construction bench.py commits

    f, state, batch, cfg, raw = _build_task(args.task)

    hlo = f.lower(state).compile().as_text()
    fusions = parse_hlo_fusions(hlo)
    from bench import _sync
    _sync(f(state))

    import signal

    def bail(signum, frame):
        raise TimeoutError("profiler trace hung (tunnel flake) — retry")

    signal.signal(signal.SIGALRM, bail)
    signal.alarm(240)
    dev_ms, per_op = device_time(f, (state,), iters=args.iters)
    signal.alarm(0)

    named = named_ops(per_op)
    total_named = sum(ms for ms, _ in named)

    print(f"device step: {dev_ms:.3f} ms; named ops sum "
          f"{total_named:.3f} ms over {len(named)} ops\n")
    print("| ms | op | output | where | contents |")
    print("|---|---|---|---|---|")
    for ms, name in named[:args.top]:
        if name in fusions:
            outty, mix, where = fusions[name]
            desc = summarize_mix(mix)
        elif "encoder" in name:
            outty, where, desc = ("(B, M_pad, C) f32", "encoder pooling",
                                  "Pallas windowed segment-max")
        elif name.startswith("sort"):
            outty, where, desc = "-", "encoder", "multi-operand bitonic sort"
        else:
            outty, where, desc = "-", "", "-"
        print(f"| {ms:.3f} | {name} | {outty} | {where} | {desc} |")
    rest = sum(ms for ms, _ in named[args.top:])
    print(f"| {rest:.3f} | (remaining {max(len(named)-args.top, 0)} ops) "
          f"| | | |")

    # category aggregation over ALL named ops (sonet_tpu.utils.hlocat
    # — the same attribution bench.py commits per round)
    cats = categorize(per_op, fusions)
    print("\ncategory totals (ms/step):")
    for k, v in sorted(cats.items(), key=lambda x: -x[1]):
        print(f"  {v:6.3f}  {k}")


if __name__ == "__main__":
    main()
