"""Loader + timing harness for the measured-local scalar CPU baseline.

Builds ``bench/cpu_scalar.cpp`` with g++ -O3 on first use (same cached
per-user-.so pattern as simd_minimizers_tpu/native). See the .cpp header
for what this baseline is and why it exists; ``bench/algs.py`` holds the
instrumented (comparison-counting) Python versions of the same zoo.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import time

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "cpu_scalar.cpp")
_lib = None
_tried = False

ALGS = {"queue": 0, "rescan": 1, "naive": 2}


def load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        import sys

        sys.path.insert(0, os.path.dirname(_HERE))
        from simd_minimizers_tpu import cache_dir

        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.path.join(cache_dir(), f"cpu_scalar_{tag}.so")
        if not os.path.exists(cache):
            tmp = cache + f".{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, cache)
        lib = ctypes.CDLL(cache)
        lib.scalar_minimizers.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.scalar_minimizers.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _table4(hasher) -> np.ndarray:
    """4-entry uint32 table driving the rolling hash for DNA codes."""
    if hasattr(hasher, "table"):
        return np.ascontiguousarray(hasher.table, dtype=np.uint32)
    # MulHasher: table[c] = (c+1) * mul_const (hashers/__init__.py)
    mc = np.uint32(hasher.mul_const)
    return ((np.arange(4, dtype=np.uint32) + np.uint32(1)) * mc).astype(np.uint32)


def scalar_minimizers(codes: np.ndarray, k: int, w: int, hasher,
                      alg: str = "queue") -> np.ndarray:
    """Dedup'd minimizer positions via the C++ scalar baseline."""
    lib = load()
    assert lib is not None, "g++ toolchain unavailable"
    assert not (hasher.canonical and alg != "queue"), \
        "canonical is implemented for the queue algorithm only"
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    nw = len(codes) - (k + w - 1) + 1
    if nw <= 0:
        return np.zeros(0, np.uint32)
    out = np.empty(nw, np.uint32)
    t4 = _table4(hasher)
    cnt = lib.scalar_minimizers(
        codes.ctypes.data_as(ctypes.c_void_p), len(codes), k, w,
        int(hasher.canonical), ALGS[alg],
        t4.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p))
    assert cnt >= 0, "scalar_minimizers rejected arguments"
    return out[:cnt].copy()


def time_scalar(codes: np.ndarray, k: int, w: int, hasher, alg: str = "queue",
                reps: int = 3) -> float:
    """Best-of-reps seconds for one full scalar sketch of ``codes``."""
    lib = load()
    assert lib is not None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    nw = len(codes) - (k + w - 1) + 1
    out = np.empty(max(nw, 1), np.uint32)
    t4 = _table4(hasher)
    args = (codes.ctypes.data_as(ctypes.c_void_p), len(codes), k, w,
            int(hasher.canonical), ALGS[alg],
            t4.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p))
    lib.scalar_minimizers(*args)  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        lib.scalar_minimizers(*args)
        best = min(best, time.perf_counter() - t0)
    return best
