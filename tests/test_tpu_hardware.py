"""Hardware differential fuzz: fused Mosaic-compiled kernel vs oracle.

These only run when a real TPU is attached (skipped in CPU CI — the
interpret-mode tests cover semantics there). They catch lowering-specific
issues (layouts, DMA alignment, unsigned-compare lowering) that the
interpreter cannot.

Run manually:  JAX_PLATFORMS='' python -m pytest tests/test_tpu_hardware.py -q
(the default conftest forces CPU; this module overrides it per-process
only when the env var SMTPU_TPU_TESTS=1 is set.)
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("SMTPU_TPU_TESTS") != "1",
    reason="set SMTPU_TPU_TESTS=1 (with a real TPU attached) to run",
)


@requires_tpu
def test_fused_fuzz_on_tpu():
    import jax

    assert jax.devices()[0].platform == "tpu", "TPU required"
    from simd_minimizers_tpu.hashers import AntiLexHasher, MulHasher, NtHasher
    from simd_minimizers_tpu.ops import oracle, pipeline
    from simd_minimizers_tpu.ops.batch import sketch_batch as batch_sketch
    from simd_minimizers_tpu.ops.fused import fused_sketch

    rng = np.random.default_rng(0xF022)
    configs = [
        (21, 11, True, NtHasher, "minimizers", False),
        (5, 7, True, NtHasher, "minimizers", True),
        (31, 5, False, MulHasher, "minimizers", False),
        (19, 19, True, AntiLexHasher, "minimizers", False),
        (5, 7, True, AntiLexHasher, "minimizers", False),
        (33, 7, True, AntiLexHasher, "minimizers", False),
        (21, 11, True, MulHasher, "minimizers", False),
        (5, 7, True, NtHasher, "superkmers", False),
        (11, 7, False, NtHasher, "closed_syncmers", False),
        (11, 7, False, NtHasher, "open_syncmers", False),
        (64, 3, False, NtHasher, "minimizers", False),
        (2, 2, True, NtHasher, "minimizers", False),
    ]
    for i, (k, w, canonical, hcls, mode, amb_on) in enumerate(configs):
        n = int(rng.integers(40000, 90000))
        codes = rng.integers(0, 4, n, dtype=np.uint8)
        amb = (rng.random(n) < 0.01).astype(np.uint8) if amb_on else None
        h = hcls(k, canonical=canonical)
        # alternate exact and over-provisioned grids (masked tail blocks)
        G = 8 if i % 2 else None
        got = fused_sketch(codes, k, w, h, mode=mode, ambiguous_np=amb, G=G)
        sel = oracle.selected_stream(codes, k, w, h, ambiguous=amb)
        if mode == "superkmers":
            want = oracle.collect_and_dedup_with_index(sel)
            np.testing.assert_array_equal(got[0], want[0], err_msg=str((k, w, mode)))
            np.testing.assert_array_equal(got[1], want[1], err_msg=str((k, w, mode)))
        elif mode.endswith("syncmers"):
            want = oracle.collect_syncmers(sel, w, mode == "open_syncmers")
            np.testing.assert_array_equal(got, want, err_msg=str((k, w, mode)))
        else:
            want = oracle.collect_and_dedup(sel, skip_sentinel=amb_on)
            np.testing.assert_array_equal(got, want, err_msg=str((k, w, mode)))

    # multi-block superkmers: the two-plane pipelined append (both write
    # DMAs on one semaphore, VMEM tail extraction for pos AND idx) only
    # exercises its cross-block seams when G > 2
    k, w = 21, 11
    codes = rng.integers(0, 4, 400_000, dtype=np.uint8)
    h = NtHasher(k, canonical=True)
    got = fused_sketch(codes, k, w, h, mode="superkmers")
    sel = oracle.selected_stream(codes, k, w, h)
    want = oracle.collect_and_dedup_with_index(sel)
    np.testing.assert_array_equal(got[0], want[0], err_msg="superkmers G>2 pos")
    np.testing.assert_array_equal(got[1], want[1], err_msg="superkmers G>2 idx")

    # clustered ambiguity across several blocks: drives BOTH branches of
    # the per-block amb gate (clean blocks skip the amb DMA + decode +
    # fold entirely) and the mixed-block seams on real DMA semantics —
    # uniform 1% masks flag every 64Kbp block, so the loop above never
    # takes the skip branch on silicon
    k, w = 21, 11
    codes = rng.integers(0, 4, 400_000, dtype=np.uint8)
    amb = np.zeros(400_000, np.uint8)
    amb[150_000:150_060] = 1      # one block's interior
    amb[65_540] = 1               # within block 0's halo span
    h = NtHasher(k, canonical=True)
    got = fused_sketch(codes, k, w, h, ambiguous_np=amb)
    want = oracle.collect_and_dedup(
        oracle.selected_stream(codes, k, w, h, ambiguous=amb),
        skip_sentinel=True)
    np.testing.assert_array_equal(got, want, err_msg="clustered skip-amb")

    # large-w row-striped halo (> TAIL) through the compiled kernel
    h = NtHasher(21, canonical=True)
    codes = rng.integers(0, 4, 120_000, dtype=np.uint8)
    got = fused_sketch(codes, 21, 2047, h, dna=True)
    want = oracle.collect_and_dedup(
        oracle.selected_stream(codes, 21, 2047, h))
    np.testing.assert_array_equal(got, want, err_msg="large-w halo on chip")

    # rowf32 compaction: f32 one-hot dots must hold exact integer routing
    # on the real MXU (precision=HIGHEST; interpret mode cannot prove it)
    got = fused_sketch(codes, 21, 11, h, compact="rowf32")
    want = oracle.collect_and_dedup(oracle.selected_stream(codes, 21, 11, h))
    np.testing.assert_array_equal(got, want, err_msg="rowf32 on chip")

    # byte-striped input modes (general text; ascii-DNA folded on device)
    text = rng.integers(32, 127, 50000, dtype=np.uint8)
    h = MulHasher(7)
    got = fused_sketch(text, 7, 5, h)
    want = oracle.collect_and_dedup(oracle.selected_stream(text, 7, 5, h))
    np.testing.assert_array_equal(got, want, err_msg="generic text striped8")

    # seeded table through the compiled kernel
    hs = NtHasher(21, canonical=True, seed=101010)
    codes = rng.integers(0, 4, 60000, dtype=np.uint8)
    got = fused_sketch(codes, 21, 11, hs)
    want = oracle.collect_and_dedup(oracle.selected_stream(codes, 21, 11, hs))
    np.testing.assert_array_equal(got, want, err_msg="seeded nt on chip")

    # batched fuzz
    reads = [rng.integers(0, 4, int(m), dtype=np.uint8)
             for m in rng.integers(0, 4096, 40)]
    h = NtHasher(21, canonical=True)
    rid, pos = batch_sketch(reads, 21, 11, h, backend="fused")
    for i, rd in enumerate(reads):
        want = (oracle.collect_and_dedup(oracle.selected_stream(rd, 21, 11, h))
                if len(rd) >= 31 else np.zeros(0, np.uint32))
        np.testing.assert_array_equal(pos[rid == i], want, err_msg=f"read {i}")


@requires_tpu
def test_zero_window_launch_on_tpu():
    """A compiled launch with nw_total = 0 (the empty-shard case produced
    by fused_sharded_sketch on over-provisioned meshes) must return
    count 0 and terminate cleanly — no block is active, so the block-0
    input DMA start must be gated or the kernel exits with it pending
    (undefined behavior only observable on real hardware)."""
    import jax.numpy as jnp

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import fused
    from simd_minimizers_tpu.ops.pipeline import hasher_jit_args

    k, w = 21, 11
    h = NtHasher(k, canonical=True)
    key, table, mul_const = hasher_jit_args(h)
    C, G = fused.DEF_C, 2
    PADH = fused.padh_for(k + w - 1)
    _, _, SPW_PAD = fused.rowstriped_geometry(C, PADH)
    words = jnp.zeros((G * fused.RB, SPW_PAD), jnp.uint32)
    out, idx, count = fused._fused_call(
        words, jnp.zeros(fused.TAIL, jnp.uint32),
        jnp.asarray([0, 0], np.int32),  # nw_total = 0
        jnp.asarray(table), jnp.asarray([mul_const], np.uint32),
        k=k, w=w, mode="minimizers", skip_ambiguous=False, hasher_key=key,
        C=C, G=G, input_mode="striped2r",
    )
    assert int(count[0]) == 0
    # a second normal launch must still work (no semaphore corruption)
    rng = np.random.default_rng(0xE0)
    codes = rng.integers(0, 4, 50000, dtype=np.uint8)
    from simd_minimizers_tpu.ops import oracle

    got = fused.fused_sketch(codes, k, w, h)
    want = oracle.collect_and_dedup(oracle.selected_stream(codes, k, w, h))
    np.testing.assert_array_equal(got, want)


@requires_tpu
def test_sketch_long_spans_on_tpu():
    """Compiled span streaming with u32 offsets + seam merge."""
    import numpy as np

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import oracle
    from simd_minimizers_tpu.ops.fused import sketch_long

    rng = np.random.default_rng(0x10E6)
    codes = rng.integers(0, 4, 400000, dtype=np.uint8)
    h = NtHasher(21, canonical=True)
    got = sketch_long(codes, 21, 11, h, span_chars=150000)
    want = oracle.collect_and_dedup(oracle.selected_stream(codes, 21, 11, h))
    np.testing.assert_array_equal(got, want)


@requires_tpu
def test_fused_sharded_on_tpu():
    """Pallas kernel inside shard_map on the real (1-chip) mesh."""
    import numpy as np

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import oracle
    from simd_minimizers_tpu.parallel.shard import fused_sharded_sketch

    rng = np.random.default_rng(0x5A)
    codes = rng.integers(0, 4, 300000, dtype=np.uint8)
    h = NtHasher(21, canonical=True)
    got = fused_sharded_sketch(codes, 21, 11, h)
    want = oracle.collect_and_dedup(oracle.selected_stream(codes, 21, 11, h))
    np.testing.assert_array_equal(got, want)


@requires_tpu
def test_sketch_records_on_tpu():
    """Cross-record depth-2 pipeline on the compiled kernel: per-record
    results vs the oracle, mixed lengths incl. a multi-span record."""
    import numpy as np

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import oracle
    from simd_minimizers_tpu.ops.fused import sketch_records

    rng = np.random.default_rng(0x2EC)
    recs = [rng.integers(0, 4, n, dtype=np.uint8)
            for n in (25, 120000, 400000, 7000)]
    h = NtHasher(21, canonical=True)
    got = sketch_records(recs, 21, 11, h, span_chars=150000, dna=True)
    for codes, g in zip(recs, got):
        if codes.size < 31:
            assert g.size == 0
            continue
        want = oracle.collect_and_dedup(
            oracle.selected_stream(codes, 21, 11, h))
        np.testing.assert_array_equal(g, want)


@requires_tpu
def test_device_values_on_tpu():
    """On-device value assembly (funnel shifts, 2-bit-group reversal,
    u128 limbs) vs the host NumPy path on the real chip — catches any
    TPU-specific gather/shift lowering divergence."""
    import numpy as np

    from simd_minimizers_tpu.ops import device_values as dv
    from simd_minimizers_tpu.ops import values as hv

    rng = np.random.default_rng(0xDE7)
    codes = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    for k in (21, 31, 33, 64):
        pos = rng.integers(0, codes.size - k + 1, 100_000).astype(np.uint32)
        pos[:2] = [0, codes.size - k]
        if k <= 32:
            np.testing.assert_array_equal(
                dv.kmer_values_u64(codes, pos, k, canonical=True),
                hv.canonical_kmer_values_u64(codes, pos, k))
            np.testing.assert_array_equal(
                dv.kmer_values_u64(codes, pos, k),
                hv.kmer_values_u64(codes, pos, k))
        else:
            got = dv.kmer_values_u128_limbs(codes, pos, k, canonical=True)
            want = hv.canonical_kmer_values_u128_limbs(codes, pos, k)
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])
