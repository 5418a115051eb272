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
import collections
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# ops that are wiring, not work — dropped from the summary mix
_TRIVIAL = {"parameter", "constant", "tuple", "get-tuple-element",
            "bitcast", "copy", "reshape"}


def parse_hlo_fusions(hlo: str):
    """instruction name -> (output type/shape, op-kind mix, root hint).

    Handles both `%fusion.27 = bf16[8,15000]{...} fusion(...),
    calls=%fused_computation.27` and unprefixed spellings."""
    def split_type_op(rhs: str):
        """'(f32[..]{..}, ..) opcode(args)' or 'bf16[..]{..} opcode(..)'
        -> (type str, opcode) — balanced-paren aware (layouts contain
        T(8,128) parens; tuple types contain commas and spaces)."""
        rhs = rhs.lstrip()
        if rhs.startswith("("):
            depth = 0
            for i, ch in enumerate(rhs):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        ty, rest = rhs[:i + 1], rhs[i + 1:].lstrip()
                        break
            else:
                return None
        else:
            sp = rhs.find(" ")
            if sp < 0:
                return None
            ty, rest = rhs[:sp], rhs[sp + 1:].lstrip()
        m = re.match(r"([\w\-]+)\(", rest)
        return (ty, m.group(1)) if m else None

    # computation headers are lines without '=' ending in '{'
    comp_ops = collections.defaultdict(collections.Counter)
    comp_paths = collections.defaultdict(collections.Counter)
    fusion_decl = {}  # fusion instruction name -> (out type, computation)
    cur = None
    path_re = re.compile(
        r'op_name="jit\([^)]*\)/(?:jvp\(|transpose\(jvp\()?'
        r"[\w]*\)?/?([^\"]*)\"")
    for line in hlo.splitlines():
        stripped = line.rstrip()
        if "=" not in line and stripped.endswith("{"):
            m = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", line)
            cur = m.group(1) if m else None
            continue
        if stripped == "}":
            cur = None
            continue
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$", line)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        parsed = split_type_op(rhs)
        if not parsed:
            continue
        ty, opcode = parsed
        if cur is not None:
            comp_ops[cur][opcode] += 1
            pm = path_re.search(line)
            if pm:
                # keep the module path, drop the primitive tail
                parts = pm.group(1).split("/")
                comp_paths[cur]["/".join(parts[:-1]) or parts[0]] += 1
        if opcode == "fusion":
            call = re.search(r"calls=%?([\w.\-]+)", line)
            if call:
                fusion_decl[name] = (ty, call.group(1))

    fusions = {}
    for name, (outty, comp) in fusion_decl.items():
        mix = comp_ops.get(comp, collections.Counter())
        work = {k: v for k, v in mix.items() if k not in _TRIVIAL}
        paths = comp_paths.get(comp, collections.Counter())
        where = paths.most_common(1)[0][0] if paths else ""
        fusions[name] = (re.sub(r"{[^{}]*}", "", outty), work, where)
    return fusions


def summarize_mix(mix: dict, n: int = 5) -> str:
    items = sorted(mix.items(), key=lambda x: -x[1])[:n]
    return " ".join(f"{k}x{v}" if v > 1 else k for k, v in items) or "-"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sonet_tpu import config as cfg_mod, train
    from sonet_tpu.models import build_model
    from sonet_tpu.utils.tprof import device_time

    cfg = cfg_mod.modelnet40()
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    B, N, M = cfg.batch_size, cfg.input_pc_num, cfg.node_num
    batch = {"pc": jnp.asarray(rs.randn(B, N, 3).astype(np.float32)),
             "sn": jnp.asarray(rs.randn(B, N, 3).astype(np.float32)),
             "node": jnp.asarray(rs.randn(B, M, 3).astype(np.float32)),
             "label": jnp.asarray(rs.randint(0, cfg.classes, B))}
    state = train.init_state(model, cfg, jax.random.PRNGKey(0),
                             (batch["pc"], batch["sn"], batch["node"]),
                             steps_per_epoch=1230)
    train_step, _ = train.make_steps(model, cfg, 1230)
    raw = train_step.__wrapped__
    rng = jax.random.PRNGKey(1)
    f = jax.jit(lambda s: raw(s, batch, rng))

    hlo = f.lower(state).compile().as_text()
    fusions = parse_hlo_fusions(hlo)
    out = f(state)
    float(out[1]["loss"])

    import signal

    def bail(signum, frame):
        raise TimeoutError("profiler trace hung (tunnel flake) — retry")

    signal.signal(signal.SIGALRM, bail)
    signal.alarm(240)
    dev_ms, per_op = device_time(f, (state,), iters=args.iters)
    signal.alarm(0)

    named = []
    for name, ms in per_op.items():
        if re.fullmatch(r"\d+", name) or name.startswith("jit_"):
            continue  # iteration lanes / whole-program span
        named.append((ms, name))
    named.sort(reverse=True)
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

    # category aggregation over ALL named ops
    cats = collections.Counter()
    for ms, name in named:
        if "encoder" in name and name.split(".")[0] == "encoder":
            cats["pallas pooling"] += ms
        elif name.startswith("sort"):
            cats["sorts"] += ms
        elif name.startswith(("copy", "pad", "all-reduce", "transpose")):
            cats["copies/pads"] += ms
        elif name in fusions:
            outty, mix, where = fusions[name]
            tup = re.findall(r"f32\[[\d,]*\]", outty)
            if "BatchNorm" in where and "reduce" in mix:
                cats["BN stats"] += ms
            elif ("divide" in mix and outty.startswith("(")
                    and len(set(tup)) == 1 and len(tup) >= 3):
                cats["adam updates"] += ms
            elif "convolution" in mix or "dot" in mix:
                cats["GEMMs"] += ms
            elif "scatter" in mix:
                cats["scatters"] += ms
            else:
                cats["other fusions"] += ms
        else:
            cats["other"] += ms
    print("\ncategory totals (ms/step):")
    for k, v in cats.most_common():
        print(f"  {v:6.3f}  {k}")


if __name__ == "__main__":
    main()
