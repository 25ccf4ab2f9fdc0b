"""Property tests of the NumPy oracle, mirroring /root/reference/src/test.rs.

The oracle is the contract every accelerated backend is compared against,
so its own invariants (rc symmetry, syncmer selection, dedup semantics,
ambiguity skipping) are tested here directly.
"""

import numpy as np
import pytest

from simd_minimizers_tpu.hashers import AntiLexHasher, MulHasher, NtHasher
from simd_minimizers_tpu.ops import oracle
from simd_minimizers_tpu.seq.packed import (
    AsciiSeq,
    PackedNSeqVec,
    PackedSeqVec,
)
from simd_minimizers_tpu.utils.bits import SKIPPED

RNG = np.random.default_rng(0xC0FFEE)


def kw_grid():
    """(k, w) sweep in the spirit of test.rs test_on_inputs (trimmed)."""
    ks = [1, 2, 3, 5, 31, 32, 33, 63, 65] + list(RNG.integers(6, 100, 3))
    ws = [1, 2, 3, 5, 31, 33, 63] + list(RNG.integers(6, 100, 3))
    return [(int(k), int(w)) for k in ks for w in ws]


@pytest.fixture(scope="module")
def random_seq():
    return PackedSeqVec.random(2048, RNG)


def test_naive_vs_one_minimizer(random_seq):
    """The selected_stream fwd path equals a per-window one_minimizer scan."""
    codes = random_seq.codes()
    for k, w in [(5, 7), (11, 21), (19, 19), (3, 4)]:
        h = NtHasher(k)
        sel = oracle.selected_stream(codes, k, w, h)
        l = k + w - 1
        naive = np.array(
            [j + oracle.one_minimizer(codes[j : j + l], h) for j in range(len(codes) - l + 1)],
            dtype=np.uint32,
        )
        np.testing.assert_array_equal(sel, naive)


@pytest.mark.parametrize("hasher_cls", [NtHasher, MulHasher, AntiLexHasher])
def test_canonical_rc_symmetry(random_seq, hasher_cls):
    """fwd/rc positions satisfy x + y == len - k; values reverse-equal
    (reference src/test.rs:112-152)."""
    rc = random_seq.to_revcomp()
    n = len(random_seq)
    for k, w in kw_grid():
        if (k + w - 1) % 2 == 0 or k + w - 1 > n or k > 32:
            continue
        h = hasher_cls(k, canonical=True)
        fwd = oracle.canonical_minimizer_positions(random_seq, k, w, h)
        rcp = oracle.canonical_minimizer_positions(rc, k, w, h)
        assert len(fwd) == len(rcp), (k, w)
        for x, y in zip(fwd.tolist(), rcp.tolist()[::-1]):
            assert x + y == n - k, (k, w, x, y)
        fv = [min(random_seq.read_kmer(k, int(p)), random_seq.read_revcomp_kmer(k, int(p))) for p in fwd]
        rv = [min(rc.read_kmer(k, int(p)), rc.read_revcomp_kmer(k, int(p))) for p in rcp]
        assert fv == rv[::-1], (k, w)


def test_ascii_equals_packed(random_seq):
    ascii_seq = AsciiSeq(random_seq.to_ascii())
    for k, w in [(5, 7), (21, 11), (31, 5), (2, 2), (63, 3)]:
        np.testing.assert_array_equal(
            oracle.minimizer_positions(ascii_seq, k, w),
            oracle.minimizer_positions(random_seq, k, w),
        )
        if (k + w - 1) % 2 == 1:
            np.testing.assert_array_equal(
                oracle.canonical_minimizer_positions(ascii_seq, k, w),
                oracle.canonical_minimizer_positions(random_seq, k, w),
            )


def test_slicing_offsets(random_seq):
    """Non-byte offsets into packed data behave like re-packing from ascii
    (reference src/test.rs:24-51 sweeps offsets 0..=3)."""
    ascii_bytes = random_seq.to_ascii()
    for off in range(4):
        for ln in [0, 1, 37, 256, 1000]:
            sl = random_seq.slice(off, off + ln)
            re = PackedSeqVec.from_ascii(ascii_bytes[off : off + ln])
            np.testing.assert_array_equal(sl.codes(), re.codes())
            np.testing.assert_array_equal(
                oracle.minimizer_positions(sl, 5, 7),
                oracle.minimizer_positions(re, 5, 7),
            )


def test_empty_and_short_inputs():
    for n in range(0, 12):
        seq = PackedSeqVec.random(n, RNG)
        pos = oracle.minimizer_positions(seq, 5, 7)
        if n < 11:
            assert pos.size == 0
        else:
            assert pos.size >= 1


def test_collect_and_dedup_basic():
    """Mirrors reference src/test.rs:334-356."""
    out = oracle.collect_and_dedup(np.array([0, 1, 2, 3, 4, 5], dtype=np.uint32))
    assert out.tolist() == [0, 1, 2, 3, 4, 5]
    out = oracle.collect_and_dedup(np.array([0, 0, 1, 1, 2, 2], dtype=np.uint32))
    assert out.tolist() == [0, 1, 2]


def test_collect_and_dedup_with_index():
    """Mirrors reference src/test.rs:344-356."""
    pos, idx = oracle.collect_and_dedup_with_index(np.array([0, 0, 1, 1, 2, 2], dtype=np.uint32))
    assert pos.tolist() == [0, 1, 2]
    assert idx.tolist() == [0, 2, 4]


def test_collect_and_dedup_skip_sentinel():
    """Mirrors reference src/test.rs:358-399 (AVX2/SIMD semantics)."""
    x = int(SKIPPED)
    v = np.array([0, 1, 1, x, 2, 3, x, x, 4], dtype=np.uint32)
    assert oracle.collect_and_dedup(v).tolist() == [0, 1, x, 2, 3, x, 4]
    assert oracle.collect_and_dedup(v, skip_sentinel=True).tolist() == [0, 1, 2, 3, 4]
    v = np.array([1, x, x, x, x, x, x, 2, x, x, x, x], dtype=np.uint32)
    assert oracle.collect_and_dedup(v).tolist() == [1, x, 2, x]
    assert oracle.collect_and_dedup(v, skip_sentinel=True).tolist() == [1, 2]


def test_syncmer_selection_handcrafted():
    """Mirrors reference src/test.rs:484-515."""
    closed = lambda s: oracle.collect_syncmers(np.array(s, dtype=np.uint32), 5, False).tolist()
    open_ = lambda s: oracle.collect_syncmers(np.array(s, dtype=np.uint32), 5, True).tolist()
    assert closed(range(10)) == list(range(10))  # left-syncmers
    assert closed(range(4, 14)) == list(range(10))  # right-syncmers
    assert closed([1, 2, 5, 5, 5, 8, 7, 10, 10, 10]) == []
    assert open_(range(2, 12)) == list(range(10))  # middle selected
    assert open_([0, 1, 6, 7, 7, 6, 6, 8, 11, 10]) == []


def test_closed_syncmer_values_all_g():
    """All-G sequence: every window is a closed syncmer with all-ones value
    (reference src/test.rs:577-597)."""
    n = 100
    seq = PackedSeqVec.from_ascii(b"G" * n)
    for k in range(1, 8):
        for w in range(1, 8):
            pos = oracle.syncmer_positions(seq, k, w, open_=False)
            l = k + w - 1
            assert pos.size == n - l + 1
            vals = [seq.read_kmer(l, int(p)) for p in pos]
            assert all(v == (1 << (2 * l)) - 1 for v in vals)


def test_syncmer_rc_symmetry(random_seq):
    """Canonical syncmer positions satisfy x + y == len - (k+w-1)
    (reference src/test.rs:641-708)."""
    rc = random_seq.to_revcomp()
    n = len(random_seq)
    for k, w in [(5, 7), (11, 21), (7, 5), (3, 9)]:
        l = k + w - 1
        if l % 2 == 0 or w % 2 == 0:
            continue
        for open_ in (False, True):
            f = oracle.syncmer_positions(random_seq, k, w, open_, canonical=True)
            r = oracle.syncmer_positions(rc, k, w, open_, canonical=True)
            assert len(f) == len(r), (k, w, open_)
            for x, y in zip(f.tolist(), r.tolist()[::-1]):
                assert x + y == n - l, (k, w, open_)


def test_skip_ambiguous():
    """No SKIPPED survives; every reported kmer is N-free
    (reference src/test.rs:428-482)."""
    n = 500
    ascii_arr = np.frombuffer(AsciiSeq.random(n, RNG).seq.tobytes(), dtype=np.uint8).copy()
    idx = RNG.integers(0, n, size=8)
    ascii_arr[idx] = ord("N")
    nseq = PackedNSeqVec.from_ascii(ascii_arr)
    for k in [1, 3, 5, 21]:
        for w in [1, 4, 11]:
            if (k + w - 1) % 2 == 0:
                continue
            pos = oracle.skip_ambiguous_canonical_minimizer_positions(nseq, k, w)
            assert not np.any(pos == SKIPPED)
            for p in pos.tolist():
                assert not nseq.ambiguous[p : p + k].any(), (k, w, p)


def test_superkmer_counts(random_seq):
    """super-kmer index stream has the same length as positions and is
    strictly increasing, with idx[0] == 0 (reference src/test.rs:154-277)."""
    for k, w in [(5, 7), (21, 11)]:
        for canonical in (False, True):
            if canonical and (k + w - 1) % 2 == 0:
                continue
            pos, idx = oracle.minimizers_with_superkmers(random_seq, k, w, canonical=canonical)
            assert len(pos) == len(idx)
            assert idx[0] == 0
            assert np.all(np.diff(idx.astype(np.int64)) > 0)


def test_density_sanity():
    """fwd minimizer density approx 2/(w+1) (reference paper.rs:419-435)."""
    seq = PackedSeqVec.random(200_000, RNG)
    for w in [5, 11, 19]:
        pos = oracle.minimizer_positions(seq, 21, w)
        density = len(pos) / (len(seq) - 21 + 1)
        expected = 2 / (w + 1)
        assert abs(density - expected) / expected < 0.08, (w, density, expected)
