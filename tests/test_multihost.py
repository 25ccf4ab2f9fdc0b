"""Multi-host sharding scheme: shard bounds, seam merge, end-to-end on one
process (shards emulated serially) == oracle."""

import numpy as np
import pytest

from simd_minimizers_tpu.hashers import NtHasher
from simd_minimizers_tpu.ops import oracle
from simd_minimizers_tpu.parallel import multihost

RNG = np.random.default_rng(0xD15)


def test_shard_bounds_cover_all_windows():
    n, l, S = 10007, 31, 4
    covered = []
    for s_id in range(S):
        s, e = multihost.shard_bounds(n, l, S, s_id)
        if e > s:
            covered.extend(range(s, e - l + 1))
    assert covered == list(range(n - l + 1))


@pytest.mark.parametrize("num_shards", [1, 2, 3, 7])
def test_emulated_multihost_matches_oracle(num_shards):
    k, w = 21, 11
    n = 30000
    codes = RNG.integers(0, 4, n, dtype=np.uint8)
    h = NtHasher(k, canonical=True)
    shards = [
        multihost.local_shard_sketch(codes, k, w, h, num_shards, s)
        for s in range(num_shards)
    ]
    got = multihost.merge_shard_positions(shards)
    want = oracle.collect_and_dedup(oracle.selected_stream(codes, k, w, h))
    np.testing.assert_array_equal(got, want)


def test_multihost_sketch_single_process():
    k, w = 5, 7
    codes = RNG.integers(0, 4, 5000, dtype=np.uint8)
    h = NtHasher(k)
    got = multihost.multihost_sketch(codes, k, w, h)
    want = oracle.collect_and_dedup(oracle.selected_stream(codes, k, w, h))
    np.testing.assert_array_equal(got, want)
