"""Native (C++) runtime components, loaded via ctypes.

Build happens lazily on first use (``g++ -O2 -shared``).  Two members:

* ``segment_max.cpp`` — reference CPU kernel for cross-checking the
  Pallas / XLA node-pooling implementations (SURVEY.md §2.2).
* ``loader.cpp`` — the host input-pipeline worker: npy read + subsample
  + augmentation for a whole batch in C++ threads, the native equivalent
  of the reference's ``DataLoader(num_workers=8)`` worker processes
  (modelnet/train.py:25).  Python surface:
  ``sonet_tpu.data.native_loader``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "segment_max.cpp"),
         os.path.join(_HERE, "loader.cpp")]
_LIB = os.path.join(_HERE, "libsonet_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    if force or (not os.path.exists(_LIB)
                 or os.path.getmtime(_LIB) < max(os.path.getmtime(s)
                                                 for s in _SRCS)):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
             *_SRCS, "-o", _LIB],
            check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        i64 = ctypes.c_int64
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.segment_argmax_cpu.argtypes = [fp, ip, i64, i64, i64, i64,
                                           ip, fp]
        lib.segment_argmax_cpu.restype = None
        lib.segment_argmax_cpu_mt.argtypes = [fp, ip, i64, i64, i64, i64,
                                              ip, fp, i64]
        lib.segment_argmax_cpu_mt.restype = None
        cp = ctypes.POINTER(ctypes.c_char_p)
        up = ctypes.POINTER(ctypes.c_uint64)
        ci = ctypes.c_int
        lib.sonet_load_batch.argtypes = [cp, cp, i64, i64, i64, up, ci,
                                         ci, ci, ci, i64, fp, fp, fp]
        lib.sonet_load_batch.restype = ci
        lib.sonet_load_npz_batch.argtypes = [cp, i64, i64, i64, up, ci,
                                             ci, ci, ci, ci, i64,
                                             fp, fp, fp, ip]
        lib.sonet_load_npz_batch.restype = ci
        lib.sonet_loader_error.argtypes = []
        lib.sonet_loader_error.restype = ctypes.c_char_p
        _lib = lib
    return _lib


def load_batch_native(pc_paths, som_paths, item_seeds: np.ndarray,
                      n_points: int, n_nodes: int, *,
                      augment: bool = False, rot_horizontal: bool = False,
                      rot_perturbation: bool = False,
                      translation_perturbation: bool = False,
                      num_threads: int = 4
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load + subsample + augment a batch of modelnet-layout items.

    pc_paths: B paths to (N, >=3|6) f32 .npy; som_paths: B paths to
    (n_nodes, 3) f32 .npy; item_seeds: (B,) uint64, one RNG seed per
    item.  Returns (pc (B, n_points, 3), sn (B, n_points, 3),
    node (B, n_nodes, 3)) float32.  Raises RuntimeError on bad files.
    """
    lib = _load()
    B = len(pc_paths)
    seeds = np.ascontiguousarray(item_seeds, np.uint64)
    assert seeds.shape == (B,)
    pc = np.empty((B, n_points, 3), np.float32)
    sn = np.empty((B, n_points, 3), np.float32)
    node = np.empty((B, n_nodes, 3), np.float32)
    enc_pc = (ctypes.c_char_p * B)(*[p.encode() for p in pc_paths])
    enc_som = (ctypes.c_char_p * B)(*[p.encode() for p in som_paths])
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.sonet_load_batch(
        ctypes.cast(enc_pc, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(enc_som, ctypes.POINTER(ctypes.c_char_p)),
        B, n_points, n_nodes,
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        int(augment), int(rot_horizontal), int(rot_perturbation),
        int(translation_perturbation), int(num_threads),
        pc.ctypes.data_as(fp), sn.ctypes.data_as(fp),
        node.ctypes.data_as(fp))
    if rc != 0:
        raise RuntimeError(
            f"native loader: {lib.sonet_loader_error().decode()}")
    return pc, sn, node


def segment_argmax_native(data: np.ndarray, seg_ids: np.ndarray,
                          num_segments: int,
                          num_threads: int = 1
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """(values (B,M,C) f32, argmax (B,M,C) i32) via the C++ kernel."""
    lib = _load()
    data = np.ascontiguousarray(data, np.float32)
    seg_ids = np.ascontiguousarray(seg_ids, np.int32)
    B, N, C = data.shape
    M = num_segments
    out_idx = np.zeros((B, M, C), np.int32)
    out_val = np.zeros((B, M, C), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    args = (data.ctypes.data_as(fp), seg_ids.ctypes.data_as(ip),
            B, N, C, M, out_idx.ctypes.data_as(ip),
            out_val.ctypes.data_as(fp))
    if num_threads > 1:
        lib.segment_argmax_cpu_mt(*args, num_threads)
    else:
        lib.segment_argmax_cpu(*args)
    return out_val, out_idx


def load_npz_batch_native(paths, item_seeds: np.ndarray, n_points: int,
                          n_nodes: int, *, augment_mode: int = 0,
                          rot_horizontal: bool = False,
                          rot_perturbation: bool = False,
                          translation_perturbation: bool = False,
                          with_seg: bool = False, num_threads: int = 4):
    """Load + resample + augment a batch of npz-layout items
    (SHREC {pc, sn, som_node}; ShapeNetPart adds part_label).

    augment_mode: 0 = none, 1 = full modelnet/shrec stack,
    2 = shapenet jitter+scale.  Returns (pc, sn, node[, seg]) with seg
    int32 (B, n_points) when with_seg.  np.savez (stored) members only —
    savez_compressed raises with a clear message.
    """
    lib = _load()
    B = len(paths)
    seeds = np.ascontiguousarray(item_seeds, np.uint64)
    assert seeds.shape == (B,)
    pc = np.empty((B, n_points, 3), np.float32)
    sn = np.empty((B, n_points, 3), np.float32)
    node = np.empty((B, n_nodes, 3), np.float32)
    seg = np.empty((B, n_points), np.int32) if with_seg else \
        np.empty((1, 1), np.int32)
    enc = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = lib.sonet_load_npz_batch(
        ctypes.cast(enc, ctypes.POINTER(ctypes.c_char_p)),
        B, n_points, n_nodes,
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        int(augment_mode), int(rot_horizontal), int(rot_perturbation),
        int(translation_perturbation), int(with_seg), int(num_threads),
        pc.ctypes.data_as(fp), sn.ctypes.data_as(fp),
        node.ctypes.data_as(fp), seg.ctypes.data_as(ip))
    if rc != 0:
        raise RuntimeError(
            f"native loader: {lib.sonet_loader_error().decode()}")
    if with_seg:
        return pc, sn, node, seg
    return pc, sn, node


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False
