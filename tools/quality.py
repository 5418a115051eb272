#!/usr/bin/env python3
"""Per-round QUALITY regression artifact (VERDICT r4 #3).

Makes quality regression self-adjudicating the way bench.py makes perf
regression self-adjudicating: one command runs the committed
hardness-tuned band check for a preset and writes ``QUALITY_r{N}.json``
next to the BENCH_r* artifacts, so a semantics regression (BN stats,
tie routing, kNN-graph timing, loss scaling) between rounds lands the
final eval metric OUTSIDE the committed 3-seed band
(tools/soak_bands.json) and the artifact records a red verdict.

Chain (each stage skipped when its output already exists):

    1. generate the band's dataset at its committed hardness
       (tools/make_<family>_scale.py --hardness H --seed 0 — the exact
       generator+seed the band was measured on)
    2. fit SOM nodes on the TPU (python -m sonet_tpu.data.prep som)
    3. band-asserted soak (tools/soak.py --band, the band's epochs,
       device pipeline, seed 0)
    4. write QUALITY_r{N}.json {preset, metric, value, band, inside,...}

Run on the real chip:

    PYTHONPATH=/root/.axon_site:. python tools/quality.py --round 5 \
        [--preset modelnet40] [--dataroot /root/mn40_scale]

Exit 0 iff the metric landed inside the band.  The modelnet40 run costs
~4 min of device time (30 epochs x 1540 steps at ~4.3 ms/step) plus
dataset generation the first time (CPU-bound, minutes).
"""

import argparse
import ast
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# preset -> (generator script, default dataroot, som rows)
FAMILIES = {
    "modelnet40": ("make_modelnet_scale.py", "/root/mn40_scale", 8),
    "shapenetpart": ("make_shapenet_scale.py", "/root/snpart_scale", 8),
    "shrec16": ("make_shrec_scale.py", "/root/shrec_scale", 8),
}


def _run(cmd, env=None, timeout=None):
    """Stream a child's output; return (rc, full stdout text)."""
    print(f"quality: $ {' '.join(cmd)}", flush=True)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    lines = []
    start = time.time()
    for line in proc.stdout:
        print(line, end="", flush=True)
        lines.append(line)
        if timeout and time.time() - start > timeout:
            proc.kill()
            raise TimeoutError(f"{cmd[0]} exceeded {timeout}s")
    proc.wait()
    return proc.returncode, "".join(lines)


def parse_soak_output(out: str, rc: int):
    """(value, inside, final_eval, clouds_per_sec) from a soak driver's
    stdout.  The band-check line is authoritative for value/inside;
    the soak exit code is the fallback when the line is missing
    (e.g. the run died before eval)."""
    inside = rc == 0
    value = None
    m = re.search(r"band check: (\S+) ([0-9.]+) (INSIDE|OUTSIDE)", out)
    if m:
        value = float(m.group(2))
        inside = m.group(3) == "INSIDE"
    ev = None
    em = re.search(r"^(?:eval|retrieval metrics[^:]*): (\{.*\})$", out,
                   re.M)
    if em:
        try:
            ev = {k: round(float(v), 4)
                  for k, v in ast.literal_eval(em.group(1)).items()
                  if isinstance(v, (int, float))}
        except (ValueError, SyntaxError):
            pass
    clouds = None
    cm = re.findall(r"= ([0-9.]+) clouds/s", out)
    if cm:
        clouds = float(cm[-1])
    return value, inside, ev, clouds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="modelnet40",
                    choices=sorted(FAMILIES))
    ap.add_argument("--round", type=int, required=True,
                    help="round number N for QUALITY_r{N:02d}.json")
    ap.add_argument("--dataroot", default=None,
                    help="dataset tree (default per preset; generated "
                         "at the band's hardness when missing)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="artifact path (default "
                         "<repo>/QUALITY_r{N:02d}.json)")
    args = ap.parse_args()

    with open(os.path.join(REPO, "tools", "soak_bands.json")) as f:
        band = json.load(f)[args.preset]
    gen, default_root, rows = FAMILIES[args.preset]
    root = args.dataroot or default_root
    # flagship artifact keeps the plain name (round-over-round
    # comparable); other presets get a suffixed sibling
    suffix = "" if args.preset == "modelnet40" else f"_{args.preset}"
    out_path = args.out or os.path.join(
        REPO, f"QUALITY_r{args.round:02d}{suffix}.json")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")

    t0 = time.time()
    # ---- 1. dataset (generator + committed hardness + seed 0) ----------
    marker = {"modelnet40": f"modelnet40_train.txt",
              "shapenetpart": "train_test_split",
              "shrec16": "train.txt"}[args.preset]
    if not os.path.exists(os.path.join(root, marker)):
        rc, _ = _run([sys.executable, os.path.join(REPO, "tools", gen),
                      "--out", root, "--hardness", str(band["hardness"]),
                      "--seed", "0"], env=env)
        if rc:
            sys.exit(f"quality: dataset generation failed ({rc})")
    else:
        print(f"quality: reusing dataset {root}", flush=True)

    # ---- 2. SOM nodes (prep som on the TPU; npz layouts rewrite) -------
    need_som = True
    if args.preset == "modelnet40":
        need_som = not os.path.isdir(
            os.path.join(root, f"{rows}x{rows}_som_nodes"))
    else:
        import glob
        import numpy as np
        npzs = sorted(glob.glob(os.path.join(root, "**", "*.npz"),
                                recursive=True))
        if npzs:
            with np.load(npzs[0]) as z:
                need_som = "som_node" not in z.files
    if need_som:
        rc, _ = _run([sys.executable, "-m", "sonet_tpu.data.prep", "som",
                      "--root", root, "--rows", str(rows),
                      "--batch", "64"], env=env)
        if rc:
            sys.exit(f"quality: SOM fitting failed ({rc})")
    else:
        print("quality: SOM nodes already present", flush=True)

    # ---- 3. band-asserted soak ------------------------------------------
    # shrec16's committed band is a RETRIEVAL band (test mAP over rank
    # files), measured by tools/soak_retrieval.py — soak.py would
    # assert classification accuracy against it instead
    if args.preset == "shrec16":
        cmd = [sys.executable,
               os.path.join(REPO, "tools", "soak_retrieval.py"),
               "--dataroot", root, "--epochs", str(band["epochs"]),
               "--seed", str(args.seed), "--band"]
    else:
        cmd = [sys.executable, os.path.join(REPO, "tools", "soak.py"),
               "--preset", args.preset, "--dataroot", root,
               "--epochs", str(band["epochs"]),
               "--input_pipeline", "device",
               "--seed", str(args.seed), "--band"]
    rc, out = _run(cmd, env=env)
    value, inside, ev, clouds = parse_soak_output(out, rc)

    # ---- 4. artifact -----------------------------------------------------
    artifact = {
        "quality": args.preset,
        "metric": band["metric"],
        "value": value,
        "band": [band["lo"], band["hi"]],
        "inside": bool(inside),
        "hardness": band["hardness"],
        "epochs": band["epochs"],
        "seed": args.seed,
        "dataset": band["dataset"],
        "band_seeds": band["seeds"],
        "final_eval": ev,
        "sustained_clouds_per_sec": clouds,
        "wall_s": round(time.time() - t0, 1),
        "soak_rc": rc,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps({k: artifact[k] for k in
                      ("quality", "metric", "value", "band", "inside")}),
          flush=True)
    return 0 if inside else 1


if __name__ == "__main__":
    raise SystemExit(main())
