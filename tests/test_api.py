"""API-shape tests mirroring the reference builder test
(/root/reference/src/test.rs:279-332) plus value extraction checks."""

import numpy as np
import pytest

import simd_minimizers_tpu as sm
from simd_minimizers_tpu.seq.packed import PackedNSeqVec, PackedSeqVec

RNG = np.random.default_rng(77)


def test_builder_shapes():
    seq = PackedSeqVec.random(512, RNG)
    k, w = 5, 7
    hasher = sm.MulHasher(k, canonical=True, seed=1234)

    sm.minimizers(k, w).run(seq)
    sm.canonical_minimizers(k, w).run(seq)
    out = sm.minimizers(k, w).super_kmers().run(seq)
    assert out.superkmer_indices is not None
    sm.canonical_minimizers(k, w).hasher(hasher).run(seq)
    out = sm.canonical_minimizers(k, w).hasher(hasher).super_kmers().run(seq)
    assert out.values_u64().dtype == np.uint64
    assert all(isinstance(v, int) for v in out.values_u128())
    # reuse of a configured builder
    m = sm.canonical_minimizers(k, w).hasher(hasher)
    for _ in range(3):
        m.super_kmers().run(seq)
    # syncmers
    sm.closed_syncmers(k, w).run(seq)
    sm.closed_syncmers(k, w).run_once(seq)
    sm.closed_syncmers(k, w).run_scalar_once(seq)
    sm.canonical_closed_syncmers(k, w).run(seq).pos_and_values_u64()
    sm.open_syncmers(k, w).run(seq)
    sm.canonical_open_syncmers(k, w).run(seq).pos_and_values_u64()


def test_run_equals_run_scalar():
    seq = PackedSeqVec.random(777, RNG)
    for b in [
        sm.minimizers(5, 7),
        sm.canonical_minimizers(21, 11),
        sm.closed_syncmers(5, 7),
        sm.canonical_open_syncmers(5, 7),
        sm.minimizers(5, 7).super_kmers(),
    ]:
        fast, slow = b.run(seq), b.run_scalar(seq)
        np.testing.assert_array_equal(fast.positions, slow.positions)
        if fast.superkmer_indices is not None:
            np.testing.assert_array_equal(fast.superkmer_indices, slow.superkmer_indices)


def test_superkmer_values_match_positions():
    seq = PackedSeqVec.random(512, RNG)
    out = sm.canonical_minimizers(5, 7).super_kmers().run(seq)
    vals = out.values_u64()
    for p, v in zip(out.positions.tolist(), vals.tolist()):
        assert v == min(seq.read_kmer(5, p), seq.read_revcomp_kmer(5, p))


def test_syncmer_values_are_lmers():
    seq = PackedSeqVec.random(300, RNG)
    k, w = 5, 7
    out = sm.closed_syncmers(k, w).run(seq)
    assert out.length == k + w - 1
    vals = out.values_u64()
    for p, v in zip(out.positions.tolist(), vals.tolist()):
        assert v == seq.read_kmer(k + w - 1, p)


def test_skip_ambiguous_api():
    n = 400
    arr = np.frombuffer(sm.AsciiSeq.random(n, RNG).seq.tobytes(), dtype=np.uint8).copy()
    arr[RNG.integers(0, n, 5)] = ord("N")
    nseq = PackedNSeqVec.from_ascii(arr)
    pos = sm.canonical_minimizers(5, 7).run_skip_ambiguous_windows_once(nseq)
    for p in pos.tolist():
        assert not nseq.ambiguous[p : p + 5].any()


def test_values_u128_large_k():
    seq = PackedSeqVec.random(600, RNG)
    k, w = 48, 5
    out = sm.minimizers(k, w).run(seq)
    with pytest.raises(AssertionError):
        out.values_u64()
    vals = out.values_u128()
    for p, v in zip(out.positions.tolist(), vals):
        assert v == seq.read_kmer(k, p)


def test_baseline_config_superkmers_mulhasher_values():
    """BASELINE config 3: minimizers + super_kmers + values_u64, MulHasher."""
    from simd_minimizers_tpu.hashers import MulHasher
    from simd_minimizers_tpu.seq.packed import PackedSeqVec

    rng = np.random.default_rng(33)
    seq = PackedSeqVec.random(3000, rng)
    k, w = 11, 7
    out = sm.minimizers(k, w).hasher(MulHasher(k)).super_kmers().run(seq)
    ref = sm.minimizers(k, w).hasher(MulHasher(k)).super_kmers().run_scalar(seq)
    np.testing.assert_array_equal(out.positions, ref.positions)
    np.testing.assert_array_equal(out.superkmer_indices, ref.superkmer_indices)
    vals = out.values_u64()
    assert vals.size == out.positions.size
    # values are the packed k-mers at the reported positions
    codes = seq.codes()
    for p, v in list(zip(out.positions[:20], vals[:20])):
        want = 0
        for i, c in enumerate(codes[p : p + k]):
            want |= int(c) << (2 * i)
        assert int(v) == want
