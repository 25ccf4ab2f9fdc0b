"""The measured-local C++ scalar baseline is bit-identical to the oracle.

bench/cpu_scalar.cpp reimplements the framework contract (rolling hash,
top-16 comparisons, leftmost/rightmost ties, strand rule, adjacent dedup)
as a single-core scalar program so the bench workspace has an external
baseline measured on THIS host (the reference's external crates are Rust
and can only be carried; /root/reference/bench/src/bin/paper.rs).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/bench")
import local_scalar  # noqa: E402

from simd_minimizers_tpu.hashers import MulHasher, NtHasher  # noqa: E402
from simd_minimizers_tpu.ops import oracle  # noqa: E402

pytestmark = pytest.mark.skipif(
    local_scalar.load() is None, reason="no g++ toolchain"
)

RNG = np.random.default_rng(11)

GRID = [(5, 7, 100), (21, 11, 5000), (1, 1, 50), (31, 5, 4097),
        (2, 4, 64), (63, 2, 1000), (17, 17, 3000), (33, 8, 2000)]


@pytest.mark.parametrize("k,w,n", GRID)
@pytest.mark.parametrize("hcls", [NtHasher, MulHasher])
def test_matches_oracle(k, w, n, hcls):
    codes = RNG.integers(0, 4, n, dtype=np.uint8)
    for canonical in (False, True):
        if canonical and (k + w - 1) % 2 == 0:
            continue
        h = hcls(k, canonical=canonical)
        want = oracle.collect_and_dedup(oracle.selected_stream(codes, k, w, h))
        for alg in (["queue"] if canonical else ["queue", "rescan", "naive"]):
            got = local_scalar.scalar_minimizers(codes, k, w, h, alg)
            np.testing.assert_array_equal(got, want, err_msg=f"{alg} {canonical}")


def test_short_and_empty():
    h = NtHasher(5, canonical=True)
    assert local_scalar.scalar_minimizers(
        np.zeros(3, np.uint8), 5, 7, h).size == 0
    assert local_scalar.scalar_minimizers(
        np.zeros(0, np.uint8), 5, 7, h).size == 0
    # exactly one window
    codes = RNG.integers(0, 4, 11, dtype=np.uint8)
    got = local_scalar.scalar_minimizers(codes, 5, 7, h)
    want = oracle.collect_and_dedup(oracle.selected_stream(codes, 5, 7, h))
    np.testing.assert_array_equal(got, want)


def test_canonical_requires_queue():
    h = NtHasher(5, canonical=True)
    with pytest.raises(AssertionError):
        local_scalar.scalar_minimizers(
            RNG.integers(0, 4, 100, dtype=np.uint8), 5, 7, h, alg="rescan")
