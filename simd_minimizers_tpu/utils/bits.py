"""Bit-twiddling helpers shared by the NumPy oracle and the JAX pipelines.

All minimizer-relevant arithmetic in this framework is modular 32-bit
(mirroring the reference crate's u32 hash pipeline, see
/root/reference/src/sliding_min.rs:104-106 for the top-16-bit comparison
convention). NumPy uint32 arrays wrap naturally; these helpers keep the
dtype discipline in one place.
"""

from __future__ import annotations

import numpy as np

U32 = np.uint32
MASK32 = np.uint32(0xFFFF_FFFF)
VAL_MASK = np.uint32(0xFFFF_0000)  # top 16 bits of a hash participate in comparisons
POS_MASK = np.uint32(0x0000_FFFF)

# Sentinel for windows that must be skipped (ambiguous bases), identical to the
# reference (`SKIPPED = u32::MAX - 1`, /root/reference/src/minimizers.rs:18).
SKIPPED = np.uint32(0xFFFF_FFFE)
INVALID = np.uint32(0xFFFF_FFFF)  # padding marker, like the reference's u32::MAX padding


def rotl32_np(x: np.ndarray, r: int) -> np.ndarray:
    """Rotate-left each uint32 element by the static amount ``r``."""
    r %= 32
    if r == 0:
        return x.astype(U32, copy=False)
    x = x.astype(U32, copy=False)
    return ((x << U32(r)) | (x >> U32(32 - r))).astype(U32)


def rotl32_var_np(x: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Rotate-left each uint32 element by per-element amounts ``r`` (0..31)."""
    x = x.astype(U32, copy=False)
    r = (r % 32).astype(U32)
    left = (x << r).astype(U32)
    # uint32 >> 32 is undefined in C semantics; mask it out explicitly.
    right = np.where(r == 0, U32(0), (x >> (U32(32) - r)).astype(U32))
    return (left | right).astype(U32)


def probe_is_dna(codes_np: np.ndarray) -> bool:
    """Last-resort O(n) host scan deciding 2-bit-DNA vs general-text codes.

    Hot paths must NOT reach this: the public API derives the answer from
    the sequence type (`seq.char_bits == 2`) and threads it down as the
    `dna=` argument. Only raw-`np.ndarray` entry points with no type
    information fall back here (tests monkeypatch this function to prove
    the public API never calls it).
    """
    return codes_np.size == 0 or int(codes_np.max()) <= 3


def splitmix64(x: int) -> int:
    """SplitMix64 finalizer; used to derive seeded hash tables."""
    mask = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & mask
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
    return z ^ (z >> 31)
