"""Native (C++) reference kernels, loaded via ctypes.

Build happens lazily on first use (``g++ -O2 -shared``); see
segment_max.cpp for semantics.  Used by the test suite to cross-check
the Pallas / XLA implementations (SURVEY.md §2.2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "segment_max.cpp")
_LIB = os.path.join(_HERE, "libsonet_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    if force or (not os.path.exists(_LIB)
                 or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
             _SRC, "-o", _LIB],
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
        _lib = lib
    return _lib


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


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False
