"""Offline dataset preparation CLI — the on-TPU replacement for the whole
reference preprocessing world: Matlab mesh sampling (data/sampler_matlab/)
and the SOM-building notebook (data/build_som/save_som.ipynb).

Subcommands:

* ``sample``  — .obj meshes -> per-shape npz {pc, sn} (area-weighted,
  10k points like sampler.m).
* ``som``     — batch-fit SOMs for per-shape npy/npz clouds on device and
  write them in the layouts the loaders expect:
  ModelNet: ``<root>/<rows>x<cols>_som_nodes/<class>/<name>.npy``;
  npz datasets: adds a ``som_node`` key next to {pc, sn, ...}.

The SOM fit samples ``--som_sample`` points per shape (4096, matching
save_som.ipynb cell 1), stacks shapes into batches and runs the jitted
``som.fit`` — the whole dataset compiles to one scan program instead of a
per-shape python loop on GPU.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import List

import numpy as np


def _iter_cloud_files(root: str) -> List[str]:
    files = []
    for ext in ("npy", "npz"):
        files += glob.glob(os.path.join(root, "**", f"*.{ext}"),
                           recursive=True)
    return sorted(f for f in files if "_som_nodes" not in f)


def _load_cloud(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        return np.load(path)["pc"]
    data = np.load(path)
    return data[:, 0:3] if data.ndim == 2 and data.shape[1] >= 3 else data


def cmd_som(args) -> None:
    import jax.numpy as jnp
    from ..som import SOMConfig, fit as som_fit

    files = _iter_cloud_files(args.root)
    if not files:
        print(f"no .npy/.npz clouds under {args.root}", file=sys.stderr)
        sys.exit(1)
    rows = args.rows
    cfg = SOMConfig(rows=rows, cols=rows, dim=3, schedule=args.schedule)
    rng = np.random.default_rng(args.seed)

    # --mesh_shape D: per-cloud fits are independent, so the batch axis
    # shards over a data mesh and XLA partitions the whole fit scan
    mesh = None
    if getattr(args, "mesh_shape", 0) and args.mesh_shape > 1:
        from ..parallel import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_mesh((args.mesh_shape,), ("data",))
        if args.batch % args.mesh_shape:
            print(f"--batch {args.batch} must divide over "
                  f"--mesh_shape {args.mesh_shape}", file=sys.stderr)
            sys.exit(1)
        batch_sharding = NamedSharding(mesh, P("data"))

    batch, paths = [], []

    def flush():
        if not batch:
            return
        # pad a final partial batch to full size: ONE compiled fit
        # program for the whole run, and the sharded placement stays
        # valid (zip(paths, nodes) below drops the padded rows)
        while len(batch) < args.batch:
            batch.append(batch[-1])
        stacked = np.stack(batch)
        if mesh is not None:
            import jax
            dev = jax.device_put(stacked, batch_sharding)
        else:
            dev = jnp.asarray(stacked)
        nodes = np.asarray(som_fit(dev, cfg))
        for p, node in zip(paths, nodes):
            _write_som(args.root, p,
                       np.ascontiguousarray(node, np.float32), rows)
        batch.clear()
        paths.clear()

    for path in files:
        pc = _load_cloud(path).astype(np.float32)
        n = min(args.som_sample, len(pc))
        idx = rng.choice(len(pc), args.som_sample, replace=n < args.som_sample)
        batch.append(pc[idx])
        paths.append(path)
        if len(batch) == args.batch:
            flush()
    flush()
    print(f"fitted {rows}x{rows} SOMs for {len(files)} shapes")


def _write_som(root: str, cloud_path: str, node: np.ndarray,
               rows: int) -> None:
    if cloud_path.endswith(".npz"):
        data = dict(np.load(cloud_path))
        data["som_node"] = node
        np.savez(cloud_path, **data)
    else:
        rel = os.path.relpath(cloud_path, root)
        out = os.path.join(root, f"{rows}x{rows}_som_nodes", rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.save(out, node)


def cmd_sample(args) -> None:
    from .sampler import normalize_cloud, read_obj, sample_mesh

    objs = sorted(glob.glob(os.path.join(args.root, "**", "*.obj"),
                            recursive=True))
    if not objs:
        print(f"no .obj meshes under {args.root}", file=sys.stderr)
        sys.exit(1)
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    for path in objs:
        v, f = read_obj(path)
        pts, normals = sample_mesh(v, f, args.points, rng)
        if args.normalize:
            pts = normalize_cloud(pts)
        rel = os.path.splitext(os.path.relpath(path, args.root))[0]
        out = os.path.join(args.out, rel + ".npz")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.savez(out, pc=pts, sn=normals)
    print(f"sampled {len(objs)} meshes -> {args.out}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="sonet_tpu.data.prep")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("sample", help="mesh -> point cloud npz")
    ps.add_argument("--root", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--points", type=int, default=10000)  # sampler.m default
    ps.add_argument("--normalize", action="store_true")
    ps.add_argument("--seed", type=int, default=0)
    ps.set_defaults(fn=cmd_sample)

    pm = sub.add_parser("som", help="batch-fit SOM nodes on device")
    pm.add_argument("--root", required=True)
    pm.add_argument("--rows", type=int, default=8)
    pm.add_argument("--som_sample", type=int, default=4096)
    pm.add_argument("--batch", type=int, default=64)
    pm.add_argument("--mesh_shape", type=int, default=0,
                    help="shard the fit batch over N devices (0 = off)")
    pm.add_argument("--schedule", default="prep",
                    choices=("prep", "online"))
    pm.add_argument("--seed", type=int, default=0)
    pm.set_defaults(fn=cmd_som)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
