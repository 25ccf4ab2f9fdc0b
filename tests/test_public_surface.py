"""Surface lock: everything MIGRATION.md/README promise exists and works.

If a rename breaks any of these, the docs are lying — fix both together.
"""

import numpy as np

import simd_minimizers_tpu as sm


def test_all_exports_exist():
    for name in sm.__all__:
        assert hasattr(sm, name), name


def test_builder_and_output_surface():
    for ctor in (sm.minimizers, sm.canonical_minimizers, sm.closed_syncmers,
                 sm.canonical_closed_syncmers, sm.open_syncmers,
                 sm.canonical_open_syncmers):
        b = ctor(5, 7)
        for meth in ("hasher", "run", "run_once", "run_scalar",
                     "run_scalar_once", "run_skip_ambiguous_windows",
                     "run_skip_ambiguous_windows_once", "run_batch"):
            assert callable(getattr(b, meth)), (ctor.__name__, meth)
    assert callable(sm.minimizers(5, 7).super_kmers)
    out = sm.canonical_minimizers(5, 7).super_kmers().run(
        sm.PackedSeqVec.from_ascii(b"ACGTGCTCAGAGACTCAGAGGA"))
    for meth in ("values_u64", "values_u128", "values_u128_limbs",
                 "pos_and_values_u64", "pos_and_values_u128"):
        assert callable(getattr(out, meth)), meth
    assert out.positions is not None and out.superkmer_indices is not None


def test_seq_type_surface():
    ps = sm.PackedSeqVec.from_ascii(b"ACGTACGTACGT")
    for meth in ("codes", "slice", "read_kmer", "read_revcomp_kmer",
                 "to_revcomp", "to_ascii", "as_slice"):
        assert callable(getattr(ps, meth)), meth
    assert isinstance(sm.as_seq(b"hello world!"), sm.GenericSeq)
    assert isinstance(sm.as_seq(b"ACGT"), sm.AsciiSeq)  # documented divergence
    n = sm.PackedNSeqVec.from_ascii(b"ACGNNNTACGT")
    assert n.ambiguous.sum() == 3


def test_hashers_seedable():
    for cls in (sm.NtHasher, sm.MulHasher, sm.AntiLexHasher):
        h = cls(5, canonical=True, seed=1)
        v = h.hash_kmers_np(np.zeros(10, np.uint8))
        assert v.dtype == np.uint32 and v.size == 6
