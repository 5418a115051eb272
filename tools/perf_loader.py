"""Host input-pipeline throughput: python vs native C++ loader (scratch).

Builds a throwaway ModelNet-layout tree of random 10k-point npy shapes,
then measures augmented items/s through (a) the python per-item path
(ModelNetDataset.__getitem__, numpy) and (b) the C++ batch path
(NativeModelNetDataset.make_batch).  Run anywhere; no TPU needed.
"""

import argparse
import os
import tempfile
import time

import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sonet_tpu.config import modelnet40
from sonet_tpu.data.modelnet import ModelNetDataset
from sonet_tpu.data.native_loader import NativeModelNetDataset


def build_tree(root, n_shapes=64, n_points=10000, rows=8):
    rs = np.random.RandomState(0)
    names = []
    os.makedirs(os.path.join(root, "shape000"), exist_ok=True)
    os.makedirs(os.path.join(root, f"{rows}x{rows}_som_nodes", "shape000"),
                exist_ok=True)
    for i in range(n_shapes):
        name = f"shape000_{i:04d}"
        names.append(name)
        np.save(os.path.join(root, "shape000", name + ".npy"),
                rs.randn(n_points, 6).astype(np.float32))
        np.save(os.path.join(root, f"{rows}x{rows}_som_nodes", "shape000",
                             name + ".npy"),
                rs.randn(rows * rows, 3).astype(np.float32))
    with open(os.path.join(root, "modelnet40_shape_names.txt"), "w") as f:
        f.write("shape000\n")
    with open(os.path.join(root, "modelnet40_train.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(root, "modelnet40_test.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", type=int, default=64)
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        build_tree(root, args.shapes)
        cfg = modelnet40().replace(rot_horizontal=True, rot_perturbation=True)

        py = ModelNetDataset(root, "train", cfg)
        t0 = time.perf_counter()
        for i in range(args.iters):
            _ = py[i % args.shapes]
        dt_py = (time.perf_counter() - t0) / args.iters
        print(f"python __getitem__: {dt_py*1e3:.2f} ms/item = "
              f"{1/dt_py:.0f} items/s", flush=True)

        nat = NativeModelNetDataset(root, "train", cfg,
                                    num_threads=args.threads)
        B = cfg.batch_size
        idx = [list(range(j * B % args.shapes, j * B % args.shapes + B))
               for j in range(args.iters // B)]
        idx = [[i % args.shapes for i in b] for b in idx]
        _ = nat.make_batch(idx[0], B)  # warm file cache symmetry
        t0 = time.perf_counter()
        for b in idx:
            _ = nat.make_batch(b, B)
        dt = (time.perf_counter() - t0) / (len(idx) * B)
        print(f"native make_batch ({args.threads} threads): "
              f"{dt*1e3:.2f} ms/item = {1/dt:.0f} items/s", flush=True)


if __name__ == "__main__":
    main()
