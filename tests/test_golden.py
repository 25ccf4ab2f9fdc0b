"""Golden correctness vectors pinned by the reference crate's doc-tests.

Sources: /root/reference/src/lib.rs:92-140 and BASELINE.md.
"""

import numpy as np

from simd_minimizers_tpu.ops import oracle
from simd_minimizers_tpu.seq.packed import AsciiSeq, PackedSeqVec

S_FWD = b"ACGTGCTCAGAGACTCAG"
S_CANON = b"ACGTGCTCAGAGACTCAGAGGA"


def test_golden_fwd_positions_ascii():
    pos = oracle.minimizer_positions(AsciiSeq(S_FWD), 5, 7)
    assert pos.tolist() == [4, 5, 8, 13]


def test_golden_fwd_positions_packed():
    pos = oracle.minimizer_positions(PackedSeqVec.from_ascii(S_FWD), 5, 7)
    assert pos.tolist() == [4, 5, 8, 13]


def test_golden_canonical_positions():
    ps = PackedSeqVec.from_ascii(S_CANON)
    pos = oracle.canonical_minimizer_positions(ps, 5, 7)
    assert pos.tolist() == [0, 7, 9, 15]


def test_golden_canonical_values_u64():
    ps = PackedSeqVec.from_ascii(S_CANON)
    pos = oracle.canonical_minimizer_positions(ps, 5, 7)
    vals = [min(ps.read_kmer(5, int(p)), ps.read_revcomp_kmer(5, int(p))) for p in pos]
    assert vals == [0b10_11_01_00_01, 0b11_00_11_00_01, 0b01_00_11_00_11, 0b11_00_11_00_01]


def test_golden_canonical_rc_positions_and_values():
    ps = PackedSeqVec.from_ascii(S_CANON)
    rc = ps.to_revcomp()
    rc_pos = oracle.canonical_minimizer_positions(rc, 5, 7)
    assert rc_pos.tolist() == [2, 8, 10, 17]
    fwd_pos = oracle.canonical_minimizer_positions(ps, 5, 7)
    n, k = len(S_CANON), 5
    for f, r in zip(fwd_pos.tolist(), rc_pos.tolist()[::-1]):
        assert f + r == n - k
    fwd_vals = [min(ps.read_kmer(k, int(p)), ps.read_revcomp_kmer(k, int(p))) for p in fwd_pos]
    rc_vals = [min(rc.read_kmer(k, int(p)), rc.read_revcomp_kmer(k, int(p))) for p in rc_pos]
    assert fwd_vals == rc_vals[::-1]
