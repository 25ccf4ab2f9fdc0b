"""The bench algorithm zoo agrees with the oracle's window minima."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/bench")
import algs  # noqa: E402

from simd_minimizers_tpu.ops.oracle import window_lr_min  # noqa: E402

RNG = np.random.default_rng(5)


def test_algs_agree_with_oracle():
    # values already truncated to top-16 semantics by using small ints
    vals = RNG.integers(0, 50, 500).astype(np.int64)
    w = 7
    want, _ = window_lr_min((vals.astype(np.uint32) << 16), w)
    for name, alg in algs.ALGS_B.items():
        got = alg(vals, w, algs.CmpCounter())
        np.testing.assert_array_equal(got, want.astype(np.int64), err_msg=name)


def test_jumping_samples_true_minimizers():
    vals = RNG.integers(0, 50, 500).astype(np.int64)
    w = 7
    dedup = algs.problem_a(vals, w)
    jump = algs.jumping_minimizers(vals, w, algs.CmpCounter())
    # every jumping sample is a true window minimizer (jumping skips windows
    # whose min changed via a new smaller entrant — "no per-window output",
    # reference bench/src/jumping.rs)
    assert set(jump.tolist()) <= set(dedup.tolist())
    assert jump.size >= dedup.size // 2


def test_comparison_counts_ordering():
    res = algs.comparison_counts(n=2048, w=11)
    # classic result: naive pays ~w-1 comparisons/element; the others beat it
    assert res["naive"] > 0.9 * 10
    assert res["split"] < res["naive"]
    assert res["queue"] < res["naive"]
    assert res["rescan"] < res["naive"]
