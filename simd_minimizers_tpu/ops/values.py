"""Vectorized kmer-value extraction (the `Output::values_*` equivalents).

Value convention pinned by the reference doc-test
(/root/reference/src/lib.rs:117-129): first base in the lowest 2 bits.
Canonical values are min(fwd, revcomp) (/root/reference/src/lib.rs:598-612).
"""

from __future__ import annotations

import numpy as np


def _gather_windows(codes: np.ndarray, positions: np.ndarray, length: int) -> np.ndarray:
    idx = positions.astype(np.int64)[:, None] + np.arange(length, dtype=np.int64)[None, :]
    return codes[idx]  # (m, length) uint8


def kmer_values_u64(codes: np.ndarray, positions: np.ndarray, length: int) -> np.ndarray:
    """uint64 packed values of length-`length` kmers at `positions` (length <= 32)."""
    assert length <= 32, "values_u64 requires kmer length <= 32"
    if positions.size == 0:
        return np.zeros(0, dtype=np.uint64)
    win = _gather_windows(codes, positions, length).astype(np.uint64)
    shifts = (2 * np.arange(length, dtype=np.uint64))[None, :]
    return (win << shifts).sum(axis=1, dtype=np.uint64)


def revcomp_kmer_values_u64(codes: np.ndarray, positions: np.ndarray, length: int) -> np.ndarray:
    assert length <= 32
    if positions.size == 0:
        return np.zeros(0, dtype=np.uint64)
    win = _gather_windows(codes, positions, length)
    win = (win ^ np.uint8(2))[:, ::-1].astype(np.uint64)
    shifts = (2 * np.arange(length, dtype=np.uint64))[None, :]
    return (win << shifts).sum(axis=1, dtype=np.uint64)


def canonical_kmer_values_u64(codes: np.ndarray, positions: np.ndarray, length: int) -> np.ndarray:
    return np.minimum(
        kmer_values_u64(codes, positions, length),
        revcomp_kmer_values_u64(codes, positions, length),
    )


def _values_u128_int(codes: np.ndarray, positions: np.ndarray, length: int, revcomp: bool) -> list[int]:
    """Arbitrary-width packed values as Python ints (covers u128, length <= 64)."""
    assert length <= 64, "values_u128 requires kmer length <= 64"
    if positions.size == 0:
        return []
    win = _gather_windows(codes, positions, length)
    if revcomp:
        win = (win ^ np.uint8(2))[:, ::-1]
    lo_len = min(length, 32)
    lo = (win[:, :lo_len].astype(np.uint64) << (2 * np.arange(lo_len, dtype=np.uint64))[None, :]).sum(axis=1, dtype=np.uint64)
    if length > 32:
        hi_len = length - 32
        hi = (win[:, 32:].astype(np.uint64) << (2 * np.arange(hi_len, dtype=np.uint64))[None, :]).sum(axis=1, dtype=np.uint64)
    else:
        hi = np.zeros_like(lo)
    return [(int(h) << 64) | int(l) for h, l in zip(hi, lo)]


def kmer_values_u128(codes: np.ndarray, positions: np.ndarray, length: int) -> list[int]:
    return _values_u128_int(codes, positions, length, revcomp=False)


def canonical_kmer_values_u128(codes: np.ndarray, positions: np.ndarray, length: int) -> list[int]:
    fwd = _values_u128_int(codes, positions, length, revcomp=False)
    rc = _values_u128_int(codes, positions, length, revcomp=True)
    return [min(a, b) for a, b in zip(fwd, rc)]
