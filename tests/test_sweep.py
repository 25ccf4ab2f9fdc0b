"""Exhaustive (k, w, len, offset) sweep vs a first-principles naive oracle.

Mirrors the reference's `test_on_inputs` grid (/root/reference/src/test.rs:
24-51): k, w in {1..5, 31..33, 63..65, + random in 6..100} x lengths
{0..100, + random <= 8192} x slice offsets 0..3. The naive oracle scores
each window independently with `one_minimizer` (per-window argmin of the
top-16 hash) and dedups — no sliding-window machinery shared with the
production code. Pure NumPy, so the grid stays cheap; the accelerated
paths are tied to this oracle by the other test modules.
"""

import numpy as np
import pytest

from simd_minimizers_tpu.hashers import AntiLexHasher, MulHasher, NtHasher
from simd_minimizers_tpu.ops import oracle
from simd_minimizers_tpu.utils.bits import VAL_MASK

RNG = np.random.default_rng(0x5EED5)
BASE = RNG.integers(0, 4, 8192, dtype=np.uint8)

KWS = sorted({1, 2, 3, 4, 5, 31, 32, 33, 63, 64, 65}
             | set(int(x) for x in RNG.integers(6, 100, 6)))
LENS = list(range(0, 40)) + [63, 64, 65, 100, 255, 1024] + [
    int(x) for x in RNG.integers(100, 8192, 6)
]


def naive_positions(codes, k, w, hasher):
    """Per-window one_minimizer + dedup (independent of window_lr_min)."""
    n = len(codes)
    l = k + w - 1
    if n < l:
        return np.zeros(0, np.uint32)
    hashes = hasher.hash_kmers_np(codes) & VAL_MASK
    out = []
    for i in range(n - l + 1):
        win = hashes[i : i + w]
        p = i + int(win.argmin())
        if not out or out[-1] != p:
            out.append(p)
    return np.asarray(out, np.uint32)


@pytest.mark.parametrize("k", KWS)
def test_fwd_sweep_over_w_and_len(k):
    # a couple of w values per k keeps the grid dense but affordable
    for w in {1, 2, 11, int(RNG.integers(3, 40))}:
        h = NtHasher(k)
        for n in [0, 1, k + w - 2, k + w - 1, k + w, 3 * (k + w), 500]:
            off = int(RNG.integers(0, 4))
            codes = BASE[off : off + n]
            got = oracle.collect_and_dedup(oracle.selected_stream(codes, k, w, h))
            want = naive_positions(codes, k, w, h)
            np.testing.assert_array_equal(got, want, err_msg=f"k={k} w={w} n={n}")


@pytest.mark.parametrize("hasher_cls", [NtHasher, MulHasher, AntiLexHasher])
def test_fwd_sweep_hashers(hasher_cls):
    for k, w in [(1, 1), (5, 7), (21, 11), (63, 4), (65, 2)]:
        h = hasher_cls(k)
        for n in [k + w - 1, 300, 2048]:
            codes = BASE[:n]
            got = oracle.collect_and_dedup(oracle.selected_stream(codes, k, w, h))
            want = naive_positions(codes, k, w, h)
            np.testing.assert_array_equal(got, want, err_msg=f"k={k} w={w} n={n}")


def test_canonical_rc_sweep():
    """Canonical positions satisfy x + y = len - k between fwd and rc."""
    for k, w in [(5, 7), (21, 11), (31, 5), (63, 3), (2, 2)]:
        if (k + w - 1) % 2 == 0:
            continue
        h = NtHasher(k, canonical=True)
        for n in [k + w - 1, 257, 2048]:
            codes = BASE[:n]
            rc = (codes ^ 2)[::-1].astype(np.uint8)
            fwd = oracle.collect_and_dedup(oracle.selected_stream(codes, k, w, h))
            bwd = oracle.collect_and_dedup(oracle.selected_stream(rc, k, w, h))
            np.testing.assert_array_equal(
                np.sort(fwd), np.sort(n - k - bwd.astype(np.int64)).astype(np.uint32),
                err_msg=f"k={k} w={w} n={n}",
            )
