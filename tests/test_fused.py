"""Fused Pallas kernel == NumPy oracle, bit-exactly (interpret mode).

The kernel runs in Pallas interpret mode here (no TPU in CI); the same
code path compiles with Mosaic on hardware, where bench.py exercises it.
Sizes span multiple grid blocks so the SMEM-carried dedup seam and the
aligned-append tail re-read are exercised.
"""

import numpy as np
import pytest

from simd_minimizers_tpu.hashers import AntiLexHasher, MulHasher, NtHasher
from simd_minimizers_tpu.ops import oracle, pipeline
from simd_minimizers_tpu.ops.fused import fused_sketch

RNG = np.random.default_rng(0xF0D)
C = 1024  # smallest legal block width (TAIL); G = nw/8192 blocks


def _want(codes, k, w, h, mode=pipeline.MODE_MINIMIZERS, ambiguous=None):
    sel = oracle.selected_stream(codes, k, w, h, ambiguous=ambiguous)
    if mode == pipeline.MODE_SUPERKMERS:
        return oracle.collect_and_dedup_with_index(sel)
    if mode in (pipeline.MODE_CLOSED_SYNCMERS, pipeline.MODE_OPEN_SYNCMERS):
        return oracle.collect_syncmers(sel, w, mode == pipeline.MODE_OPEN_SYNCMERS)
    return oracle.collect_and_dedup(sel, skip_sentinel=ambiguous is not None)


@pytest.mark.parametrize("k,w", [(5, 7), (21, 11), (31, 5), (19, 19)])
def test_fused_fwd(k, w):
    codes = RNG.integers(0, 4, 20000, dtype=np.uint8)
    h = NtHasher(k)
    got = fused_sketch(codes, k, w, h, C=C, interpret=True)
    np.testing.assert_array_equal(got, _want(codes, k, w, h))


@pytest.mark.parametrize("hasher_cls", [NtHasher, MulHasher, AntiLexHasher])
def test_fused_canonical(hasher_cls):
    k, w = 21, 11
    codes = RNG.integers(0, 4, 20000, dtype=np.uint8)
    h = hasher_cls(k, canonical=True)
    got = fused_sketch(codes, k, w, h, C=C, interpret=True)
    np.testing.assert_array_equal(got, _want(codes, k, w, h))


def test_fused_superkmers():
    k, w = 5, 7
    codes = RNG.integers(0, 4, 12000, dtype=np.uint8)
    h = NtHasher(k, canonical=True)
    got_pos, got_idx = fused_sketch(
        codes, k, w, h, mode=pipeline.MODE_SUPERKMERS, C=C, interpret=True
    )
    want_pos, want_idx = _want(codes, k, w, h, mode=pipeline.MODE_SUPERKMERS)
    np.testing.assert_array_equal(got_pos, want_pos)
    np.testing.assert_array_equal(got_idx, want_idx)


@pytest.mark.parametrize("mode", [pipeline.MODE_CLOSED_SYNCMERS, pipeline.MODE_OPEN_SYNCMERS])
def test_fused_syncmers(mode):
    k, w = 11, 7
    codes = RNG.integers(0, 4, 12000, dtype=np.uint8)
    h = NtHasher(k)
    got = fused_sketch(codes, k, w, h, mode=mode, C=C, interpret=True)
    np.testing.assert_array_equal(got, _want(codes, k, w, h, mode=mode))


def test_fused_skip_ambiguous():
    k, w = 5, 7
    n = 12000
    codes = RNG.integers(0, 4, n, dtype=np.uint8)
    amb = (RNG.random(n) < 0.01).astype(np.uint8)
    h = NtHasher(k, canonical=True)
    got = fused_sketch(codes, k, w, h, ambiguous_np=amb, C=C, interpret=True)
    np.testing.assert_array_equal(got, _want(codes, k, w, h, ambiguous=amb))


def test_fused_short_and_overprovisioned():
    k, w = 5, 7
    h = NtHasher(k)
    assert fused_sketch(np.zeros(3, np.uint8), k, w, h, C=C, interpret=True).size == 0
    codes = RNG.integers(0, 4, 500, dtype=np.uint8)
    got = fused_sketch(codes, k, w, h, C=C, interpret=True, G=4)  # masked blocks
    np.testing.assert_array_equal(got, _want(codes, k, w, h))


def test_fused_generic_text_mulhash():
    """General ASCII (&[u8]) + MulHasher: byte values survive the fused path."""
    text = RNG.integers(32, 127, 8000, dtype=np.uint8)
    k, w = 7, 5
    h = MulHasher(k)
    got = fused_sketch(text, k, w, h, C=C, interpret=True)
    np.testing.assert_array_equal(got, _want(text, k, w, h))


def test_sketch_long_spans():
    """Span streaming with u32 offsets and seam merge (interpret mode)."""
    from simd_minimizers_tpu.ops.fused import sketch_long

    k, w = 21, 11
    codes = RNG.integers(0, 4, 60000, dtype=np.uint8)
    h = NtHasher(k, canonical=True)
    got = sketch_long(codes, k, w, h, C=C, span_chars=20000, interpret=True)
    np.testing.assert_array_equal(got, _want(codes, k, w, h))
    # offset-only path
    from simd_minimizers_tpu.ops.fused import fused_sketch

    got2 = fused_sketch(codes[:20000], k, w, h, C=C, offset=1000, interpret=True)
    np.testing.assert_array_equal(got2, _want(codes[:20000], k, w, h) + 1000)


def test_fused_generic_text_striped8():
    """General ASCII text ships byte-striped and matches the oracle."""
    from simd_minimizers_tpu.hashers import MulHasher, NtHasher

    rng = np.random.default_rng(0xA5C11)
    text = rng.integers(32, 127, 20000, dtype=np.uint8)
    k, w = 7, 5
    for h in [MulHasher(k), NtHasher(k, canonical=True)]:
        if h.canonical and (k + w - 1) % 2 == 0:
            continue
        got = fused_sketch(text, k, w, h, C=1024, interpret=True)
        want = oracle.collect_and_dedup(oracle.selected_stream(text, k, w, h))
        np.testing.assert_array_equal(got, want)


def test_fused_ascii_dna_fold_on_device():
    """AsciiSeq input: raw ACGT bytes ship byte-striped and fold to 2-bit
    codes on device (the reference's ascii-dna input class,
    /root/reference/bench/src/bin/paper.rs:327-340)."""
    import jax.numpy as jnp

    from simd_minimizers_tpu import native
    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import fused as F
    from simd_minimizers_tpu.ops.pipeline import hasher_jit_args
    from simd_minimizers_tpu.seq.packed import _CODE_TO_ASCII

    rng = np.random.default_rng(0xA5C12)
    k, w, C = 21, 11, 1024
    codes_true = rng.integers(0, 4, 30000, dtype=np.uint8)
    ascii_bytes = _CODE_TO_ASCII[codes_true]
    n = ascii_bytes.size
    l = k + w - 1
    nw = n - l + 1
    BC = F.RB * C
    G = -(-nw // BC)
    _, SLABW8, SLABW8_PAD = F.striped8_geometry(C)
    buf = np.zeros(G * BC + F.TAIL, np.uint8)
    buf[:n] = ascii_bytes
    h = NtHasher(k, canonical=True)
    key, table, mul_const = hasher_jit_args(h)
    out, idx, count = F._fused_call(
        jnp.asarray(native.pack_bytes_striped(buf, G, BC, SLABW8, SLABW8_PAD)),
        jnp.zeros(F.TAIL, jnp.uint32),
        jnp.asarray([nw, 0], np.int32), jnp.asarray(table),
        jnp.asarray([mul_const], np.uint32),
        k=k, w=w, mode="minimizers", skip_ambiguous=False, hasher_key=key,
        C=C, G=G, interpret=True, input_mode="striped8", fold_ascii=True,
    )
    cnt = int(count[0])
    want = oracle.collect_and_dedup(oracle.selected_stream(codes_true, k, w, h))
    np.testing.assert_array_equal(np.asarray(out[:cnt]), want)


def test_fused_out_cap_truncates_but_counts():
    """Reduced output buffers (huge low-density runs): appends clamp so an
    overflow truncates the buffer, while count reports the true total."""
    import jax.numpy as jnp

    from simd_minimizers_tpu import native
    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import fused as F
    from simd_minimizers_tpu.ops.pipeline import hasher_jit_args

    rng = np.random.default_rng(0x0C4B)
    k, w, C = 21, 11, 1024
    n = 120000
    codes_np = rng.integers(0, 4, n, dtype=np.uint8)
    l = k + w - 1
    nw = n - l + 1
    BC = F.RB * C
    BCP = (F.RB + 1) * C
    G = -(-nw // BC)
    _, SLABW, SLABW_PAD = F.striped_geometry(C)
    buf = np.zeros(G * BC + F.TAIL, np.uint8)
    buf[:n] = codes_np
    h = NtHasher(k, canonical=True)
    key, table, mul_const = hasher_jit_args(h)
    out_cap = BCP + 4 * F.TAIL  # far below the ~nw*2/(w+1) kept elements
    out, idx, count = F._fused_call(
        jnp.asarray(native.pack_2bit_striped(buf, G, BC, SLABW, SLABW_PAD)),
        jnp.zeros(F.TAIL, jnp.uint32),
        jnp.asarray([nw, 0], np.int32), jnp.asarray(table),
        jnp.asarray([mul_const], np.uint32),
        k=k, w=w, mode="minimizers", skip_ambiguous=False, hasher_key=key,
        C=C, G=G, interpret=True, input_mode="striped2", out_cap=out_cap,
    )
    want = oracle.collect_and_dedup(oracle.selected_stream(codes_np, k, w, h))
    assert int(count[0]) == want.size  # true total survives
    w_max = out_cap - BCP - F.TAIL
    np.testing.assert_array_equal(np.asarray(out[:w_max]), want[:w_max])


@pytest.mark.parametrize("mode", ["minimizers", "superkmers", "closed_syncmers"])
def test_sketch_long_spans_all_modes_with_ambiguity(mode):
    """Span streaming + seam-aware merge for every mode, with ambiguity
    clustered at span boundaries (the case where comparing span OUTPUTS
    would misdedup — merge_adjacent_shards re-evaluates true seams)."""
    from simd_minimizers_tpu.ops.fused import sketch_long

    k, w = 5, 7
    rng = np.random.default_rng(0x51AA)
    n = 60000
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    amb = np.zeros(n, np.uint8)
    # span_chars=20000 -> seams near 20000/40000; cluster Ns there
    for c in (19990, 20005, 39995, 40012):
        amb[c] = 1
    amb |= (rng.random(n) < 0.001).astype(np.uint8)
    h = NtHasher(k, canonical=True)
    # super-k-mers x skip-ambiguous is undefined in the reference
    # (src/lib.rs:498-503: SkPos impls exist only for SYNCMER=0 without
    # the skip-ambiguous entry point) — spans are tested without Ns there
    if mode == "superkmers":
        amb = None
    got = sketch_long(codes, k, w, h, mode=mode, ambiguous_np=amb,
                      C=1024, span_chars=20000, interpret=True)
    sel = oracle.selected_stream(codes, k, w, h, ambiguous=amb)
    if mode == "superkmers":
        want = oracle.collect_and_dedup_with_index(sel)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
    elif mode == "closed_syncmers":
        want = oracle.collect_syncmers(sel, w, False)
        np.testing.assert_array_equal(got, want)
    else:
        want = oracle.collect_and_dedup(sel, skip_sentinel=True)
        np.testing.assert_array_equal(got, want)


def test_fused_extreme_k_w_edges():
    """Degenerate geometries through the fused kernel: k=1, w=1, k>32
    (u128 territory), k=64, all hashers — bit-exact vs the oracle."""
    from simd_minimizers_tpu.hashers import AntiLexHasher, MulHasher

    rng = np.random.default_rng(0xED6E)
    for k in (1, 17, 33, 64):
        for w in (1, 2, 17):
            l = k + w - 1
            for hcls in (NtHasher, MulHasher, AntiLexHasher):
                canonical = l % 2 == 1
                n = int(rng.integers(l + 1, 6000))
                codes = rng.integers(0, 4, n, dtype=np.uint8)
                h = hcls(k, canonical=canonical)
                got = fused_sketch(codes, k, w, h, C=1024, interpret=True)
                want = oracle.collect_and_dedup(
                    oracle.selected_stream(codes, k, w, h))
                np.testing.assert_array_equal(
                    got, want,
                    err_msg=f"k={k} w={w} {hcls.__name__} canon={canonical}")


@pytest.mark.parametrize(
    "compact", ["rowplace4", "rowsign", "rowmxu", "rowsignmxu", "rowmxu2",
                "rowmxu3", "rowf32", "rowmxu4"])
def test_fused_compact_variants(compact):
    """Experimental row-local compaction variants (bench/exp_kernel.py
    --compact ...) stay bit-exact vs the default "rowplace": sign-bit
    butterfly take-test field layout (rowsign*), MXU one-hot paint of the
    packed rows (row*mxu), radix-4 butterfly (rowplace4)."""
    import jax.numpy as jnp

    from simd_minimizers_tpu.ops import fused as F
    from simd_minimizers_tpu.ops.pipeline import hasher_jit_args

    rng = np.random.default_rng(0xC0FFEE)
    k, w = 21, 11
    l = k + w - 1
    n = 30_000
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    h = NtHasher(k, canonical=True)
    want = _want(codes, k, w, h)
    key, table, mul_const = hasher_jit_args(h)
    nw = n - l + 1
    G = -(-nw // (F.RB * C))
    PADH = F.padh_for(l)
    buf = np.zeros(
        max(G * F.RB * C + F.TAIL, F.rowstriped_need_chars(G, C, PADH)),
        np.uint8)
    buf[:n] = codes
    words = F.pack_rowstriped(buf, G, C, PADH)
    out, _, count = F._fused_call(
        jnp.asarray(words), jnp.zeros(F.TAIL, jnp.uint32),
        jnp.asarray([nw, 0], np.int32), jnp.asarray(table),
        jnp.asarray([mul_const], np.uint32),
        k=k, w=w, mode=pipeline.MODE_MINIMIZERS, skip_ambiguous=False,
        hasher_key=key, C=C, G=G, interpret=True, input_mode="striped2r",
        compact=compact)
    np.testing.assert_array_equal(np.asarray(out[: int(count[0])]), want)


def test_mxu_paint_limb_guard():
    """The MXU paint's 8-bit bf16 limbs are only exact while the painted
    value's hi limb stays <= 256 (enc_max = 8C + l <= 65791): beyond that
    (e.g. w = 300 at C = 8192) hi reaches 257, which bf16 rounds to 256 —
    positions came out off by exactly 256 before the guard. The predicate
    must fall back to the masked-add paint there, and the fallback stays
    bit-exact."""
    import jax.numpy as jnp

    from simd_minimizers_tpu.ops import fused as F
    from simd_minimizers_tpu.ops.pipeline import hasher_jit_args

    assert F._mxu_paint_enabled("minimizers", "rowmxu", 8192, 21 + 11 - 1)
    assert not F._mxu_paint_enabled("minimizers", "rowmxu", 8192, 22 + 300 - 1)
    # boundary: 8C + l == 65791 is the last exact geometry at C = 8192
    assert F._mxu_paint_enabled("minimizers", "rowmxu", 8192, 255)
    assert not F._mxu_paint_enabled("minimizers", "rowmxu", 8192, 256)

    rng = np.random.default_rng(0x256)
    k, w = 22, 300
    l = k + w - 1
    n = 70_000  # > one full 8*8192 block so row 7's tail paints high enc
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    h = NtHasher(k, canonical=False)
    want = _want(codes, k, w, h)
    key, table, mul_const = hasher_jit_args(h)
    nw = n - l + 1
    Cb = 8192
    G = -(-nw // (F.RB * Cb))
    PADH = F.padh_for(l)
    buf = np.zeros(
        max(G * F.RB * Cb + F.TAIL, F.rowstriped_need_chars(G, Cb, PADH)),
        np.uint8)
    buf[:n] = codes
    words = F.pack_rowstriped(buf, G, Cb, PADH)
    out, _, count = F._fused_call(
        jnp.asarray(words), jnp.zeros(F.TAIL, jnp.uint32),
        jnp.asarray([nw, 0], np.int32), jnp.asarray(table),
        jnp.asarray([mul_const], np.uint32),
        k=k, w=w, mode=pipeline.MODE_MINIMIZERS, skip_ambiguous=False,
        hasher_key=key, C=Cb, G=G, interpret=True, input_mode="striped2r",
        compact="rowmxu")
    np.testing.assert_array_equal(np.asarray(out[: int(count[0])]), want)


@pytest.mark.parametrize(
    "compact", ["flat", "rowplace", "rowsign", "rowmxu", "rowsignmxu",
                "rowmxu2", "rowmxu3", "rowf32", "rowmxu4"])
def test_fused_superkmers_compact_variants(compact):
    """Super-k-mers now ride the row-local compaction (index plane moved
    in lockstep with the packed plane); the generic flat butterfly stays
    available behind compact="flat" — both bit-exact vs the oracle."""
    import jax.numpy as jnp

    from simd_minimizers_tpu.ops import fused as F
    from simd_minimizers_tpu.ops.pipeline import hasher_jit_args

    rng = np.random.default_rng(0x5C0)
    k, w = 11, 7
    l = k + w - 1
    n = 30_000
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    h = NtHasher(k, canonical=True)
    want_pos, want_idx = _want(codes, k, w, h, mode=pipeline.MODE_SUPERKMERS)
    key, table, mul_const = hasher_jit_args(h)
    nw = n - l + 1
    G = -(-nw // (F.RB * C))
    PADH = F.padh_for(l)
    buf = np.zeros(
        max(G * F.RB * C + F.TAIL, F.rowstriped_need_chars(G, C, PADH)),
        np.uint8)
    buf[:n] = codes
    words = F.pack_rowstriped(buf, G, C, PADH)
    out, idx, count = F._fused_call(
        jnp.asarray(words), jnp.zeros(F.TAIL, jnp.uint32),
        jnp.asarray([nw, 0], np.int32), jnp.asarray(table),
        jnp.asarray([mul_const], np.uint32),
        k=k, w=w, mode=pipeline.MODE_SUPERKMERS, skip_ambiguous=False,
        hasher_key=key, C=C, G=G, interpret=True, input_mode="striped2r",
        compact=compact)
    cnt = int(count[0])
    np.testing.assert_array_equal(np.asarray(out[:cnt]), want_pos)
    np.testing.assert_array_equal(np.asarray(idx[:cnt]), want_idx)


def test_fused_halo_bound_and_large_w_fallback(monkeypatch):
    """The fused kernel's geometry bounds (fused_supported): the per-row
    halo caps l - 1 at TAIL for byte-striped (general text) inputs and at
    ROWSTRIPED_MAX_HALO for row-striped DNA. At the exact TAIL bound the
    kernel is bit-exact; beyond the applicable bound the public dispatch
    falls back to the XLA pipeline (which covers any w,
    src/sliding_min.rs:93-95) instead of tripping kernel asserts."""
    from simd_minimizers_tpu.ops import backend
    from simd_minimizers_tpu.ops import fused as F

    rng = np.random.default_rng(0xB16)
    # exact halo bound: l - 1 == TAIL
    k, w, C = 5, F.TAIL - 3, 1024
    l = k + w - 1
    assert l - 1 == F.TAIL and F.fused_supported(k, w, C)
    n = l + 3000
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    h = NtHasher(k, canonical=False)
    got = F.fused_sketch(codes, k, w, h, C=C, interpret=True)
    np.testing.assert_array_equal(got, _want(codes, k, w, h))
    # one past the bound: unsupported for text; DNA rides the wider
    # row-striped halo until ROWSTRIPED_MAX_HALO
    assert not F.fused_supported(k, w + 1, C)
    assert F.fused_supported(k, w + 1, C, dna=True)
    assert not F.fused_supported(5, (1 << 16) - 1024 + 2, 1024, dna=True)
    # dispatch with a fused backend forced: a text input past the TAIL
    # bound routes to the pipeline with oracle-exact results
    monkeypatch.setattr(backend, "_use_fused", lambda: True)
    k2, w2 = 21, 1100
    codes2 = rng.integers(0, 4, 20000, dtype=np.uint8)
    h2 = NtHasher(k2, canonical=False)
    got2 = backend.sketch(codes2, k2, w2, h2, dna=False)
    np.testing.assert_array_equal(got2, _want(codes2, k2, w2, h2))
    got3 = backend.sketch_records([codes2], k2, w2, h2, dna=False)[0]
    np.testing.assert_array_equal(got3, got2)


def test_fused_mxu_paint_fallback_large_l():
    """For l > 255 the MXU paint's 2-limb exactness bound (8C + l <=
    65791) trips and the rowmxu default must degrade to the masked-add
    rowplace paint while staying bit-exact (gate: _mxu_paint_enabled)."""
    from simd_minimizers_tpu.ops import fused as F

    assert F._mxu_paint_enabled("minimizers", "rowmxu", 8192, 255)
    assert not F._mxu_paint_enabled("minimizers", "rowmxu", 8192, 256)
    assert F._rowplace_enabled("rowmxu", 8192, 256)
    rng = np.random.default_rng(0x260)
    codes = rng.integers(0, 4, 60000, dtype=np.uint8)
    h = NtHasher(150)  # k=150, w=111 -> l=260
    got = F.fused_sketch(codes, 150, 111, h, interpret=True)
    np.testing.assert_array_equal(got, _want(codes, 150, 111, h))


@pytest.mark.parametrize("mode", ["minimizers", pipeline.MODE_CLOSED_SYNCMERS])
def test_fused_skip_ambiguous_clustered(mode):
    """Skip-ambiguous with CLUSTERED Ns (the real-genome shape: most
    blocks clean). The kernel gates the ambiguity-plane DMA + decode +
    fold per block on a prefetched any-ambiguity scalar, so clean blocks
    skip that work entirely — this test drives both branches, including
    an N that lives only in a previous block's HALO (the windows that
    straddle the block seam must still see it through the halo span of
    the row-striped wire format). Reference semantics:
    /root/reference/src/minimizers.rs:169-214."""
    rng = np.random.default_rng(0xA3B)
    k, w = 5, 7
    n = 30000  # > 3 blocks at C=1024 (BC=8192)
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    amb = np.zeros(n, np.uint8)
    amb[9000:9040] = 1          # cluster inside block 1
    amb[8193] = 1               # block 1's head == block 0's halo
    amb[n - 10] = 1             # tail block
    h = NtHasher(k, canonical=True)
    got = fused_sketch(codes, k, w, h, ambiguous_np=amb, C=C,
                       mode=mode, interpret=True)
    np.testing.assert_array_equal(
        got, _want(codes, k, w, h, mode=mode, ambiguous=amb))
    # all-clean plane: every block takes the gated (skip) branch
    got2 = fused_sketch(codes, k, w, h, ambiguous_np=np.zeros(n, np.uint8),
                        C=C, mode=mode, interpret=True)
    np.testing.assert_array_equal(
        got2, _want(codes, k, w, h, mode=mode,
                    ambiguous=np.zeros(n, np.uint8)))


def test_fused_large_w_rowstriped_halo():
    """Row-striped (DNA) inputs support halos far past TAIL: the 2-D
    (rows, SPW_PAD) wire format has no TAIL coupling (each block DMAs 8
    whole rows), so l - 1 is capped at ROWSTRIPED_MAX_HALO instead. This
    covers the reference's full w < 2^15 range at full fused speed
    (/root/reference/src/sliding_min.rs:93-95) instead of falling back
    to the XLA pipeline. Byte-striped (general text) inputs keep the
    TAIL cap."""
    from simd_minimizers_tpu.ops import fused as F

    assert F.fused_supported(21, 1100, 1024, dna=True)
    assert F.fused_supported(21, 32767, 8192, dna=True)
    assert not F.fused_supported(21, 1100, 1024)  # striped8: TAIL cap
    assert not F.fused_supported(
        21, F.ROWSTRIPED_MAX_HALO + 2 - 21 + 1, 1024, dna=True)
    rng = np.random.default_rng(0xB17)
    for k, w, canonical in [(21, 1100, False), (5, 1501, True)]:
        n = (k + w - 1) + 20000
        codes = rng.integers(0, 4, n, dtype=np.uint8)
        h = NtHasher(k, canonical=canonical)
        got = F.fused_sketch(codes, k, w, h, C=C, interpret=True, dna=True)
        np.testing.assert_array_equal(got, _want(codes, k, w, h))


def test_rowf32_wide_exactness_bound():
    """The f32 one-hot paint (compact="rowf32") is exact up to 2^24, so
    it keeps the MXU paint where the bf16 2-limb bound (8C + l <= 65791)
    forces rowmxu* to degrade to the masked-add paint — l > 255 stays
    MXU-painted and bit-exact."""
    from simd_minimizers_tpu.ops import fused as F

    assert F._mxu_paint_enabled("minimizers", "rowf32", 8192, 260)
    assert not F._mxu_paint_enabled("minimizers", "rowmxu3", 8192, 260)
    rng = np.random.default_rng(0x261)
    codes = rng.integers(0, 4, 60000, dtype=np.uint8)
    h = NtHasher(150)  # k=150, w=111 -> l=260
    got = F.fused_sketch(codes, 150, 111, h, interpret=True,
                         compact="rowf32")
    np.testing.assert_array_equal(got, _want(codes, 150, 111, h))
