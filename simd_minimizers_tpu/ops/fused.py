"""Fused Pallas TPU kernel: the whole minimizer pipeline in one pass.

One `pallas_call` computes, per grid step, a block of RB lane-rows x C
owned windows entirely in VMEM — table lookup, rolling-hash-equivalent
windowed XOR, left/right sliding-window minima, strand rule, blend, seam
dedup, stream compaction — and DMA-appends the compacted positions to the
output at a dynamically accumulated offset. The TPU grid is sequential, so
a running total and the dedup seam value are carried across steps in SMEM
scratch, exactly like the reference's streaming state
(/root/reference/src/collect.rs:252-272), and each block's INVALID tail is
overwritten by the next block's append (same overwrite-style concat the
XLA driver uses).

HBM traffic: read 0.375 B/bp of row-striped 2-bit words (incl. halo
duplication), write ~4 B/kept-position. All intermediates live in VMEM;
the kernel is VPU-bound (measured ablation in CLAUDE.md).

Semantics are bit-identical to ops/pipeline.py and the NumPy oracle:
top-16-bit hash comparison, leftmost (and rightmost for the canonical
right arm) tie-breaks (/root/reference/src/sliding_min.rs:104-106,
190-192), strict-majority-TG strand rule (/root/reference/src/canonical.rs:
12-31), adjacent-position dedup, closed/open syncmer selection
(/root/reference/src/syncmers.rs:112-120), super-k-mer first-window
indices (/root/reference/src/collect.rs:106-110).

Positions are int32-safe: one fused call handles n < 2^31 chars; larger
inputs go through the sharded / chunked drivers which add u32 offsets.
"""

from __future__ import annotations


import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hashers import KmerHasher
from .pipeline import (
    INVALID_INT,
    SKIPPED_INT,
    MODE_CLOSED_SYNCMERS,
    MODE_MINIMIZERS,
    MODE_OPEN_SYNCMERS,
    MODE_SUPERKMERS,
    hasher_jit_args,
)

U32 = jnp.uint32
I32 = jnp.int32
INVALID = np.uint32(INVALID_INT)
SKIPPED = np.uint32(SKIPPED_INT)
TOP16 = np.uint32(0xFFFF_0000)

# Block geometry: RB lane-rows of C owned windows per grid step.
RB = 8
# Every mode runs the row-local ("rowplace") compaction, whose
# row-relative encoding supports C = 8192 (fewer blocks -> lower
# per-block fixed costs; measured win over C=4096, bench/exp_kernel.py).
# Super-k-mers carry their index plane through the same row butterfly
# in lockstep.
DEF_C = 8192


ROW_COMPACTS = ("rowplace", "rowplace4", "rowsign", "rowmxu", "rowsignmxu",
                "rowmxu2", "rowmxu3", "rowf32", "rowmxu4")

# Production compaction: rowmxu3 (stacked single-dot MXU paint —
# head/tail and hi/lo limbs ride the contraction axis). Committed
# silicon evidence, all canonical k21 w11 at 1e8 bp:
#   - minimizers: 0.1397-0.1456 vs rowmxu 0.1497-0.1526
#     (bench/onchip_r5_results.json time_* rows, round-4 flip);
#     post-rel-hash band 0.1363-0.1399
#     (bench/onchip_r5c_results.json time_min_rowmxu3_*)
#   - super-k-mers: 0.1903-0.1911 vs rowmxu 0.2101-0.2151, every
#     interleaved pair (onchip_r5c_results.json time_sk_* rows)
#   - round-4 ladder context: rowmxu beat rowplace 0.1496-0.1546 vs
#     0.1703-0.1724 (onchip_r4_results.json)
# Round-5 "rowf32" challenger (f32 one-hot dots at precision=HIGHEST,
# no limb splits) REJECTED with measurement: verified bit-exact on
# silicon but 0.1780-0.1807 min / 0.2447-0.2478 sk — the 3-6x
# multi-pass cost of exact f32 MXU matmuls outweighs the limb prep it
# removes (onchip_r5c_results.json time_min_rowf32_* / time_sk_rowf32_*).
# Kept behind --compact rowf32; note its wider exactness bound keeps the
# MXU paint for l > 255 where rowmxu3 degrades to the rowplace paint
# (_mxu_paint_enabled), so one default serves every mode either way.
# "rowmxu4" (int8 chunk-32 rank: s8 dots verified exact on silicon, 5
# cumsum stages instead of 7) also REJECTED 3/3: 0.1449-0.1465 vs
# 0.1371-0.1408 — the wider collapse/expand dots and s8 relayouts cost
# more than the two stages saved (onchip_r5d_results.json).
DEF_COMPACT = "rowmxu3"


# Halo cap for the row-striped (2-bit DNA) wire format. Unlike the flat
# striped formats — whose per-block slab shares the single TAIL-aligned
# pad, capping l - 1 at TAIL — the row-striped input is a 2-D
# (rows, SPW_PAD) array DMA'd 8 whole rows per block, so the per-row
# halo only costs VMEM slab width. 33024 = 258 * 128 covers the
# reference's full w < 2^15 supported range
# (/root/reference/src/sliding_min.rs:93-95) with k up to 258.
ROWSTRIPED_MAX_HALO = 33024


def fused_supported(k: int, w: int, C: int | None = None,
                    dna: bool = False) -> bool:
    """Whether the fused kernel's geometry covers (k, w) at this C.

    Two hard bounds: the per-row halo must fit the input pad (l - 1 <=
    TAIL for the flat striped formats; <= ROWSTRIPED_MAX_HALO for
    row-striped DNA, which `dna=True` selects), and every in-row kmer
    column must fit the packed sliding-min's 16 position bits
    (C + w - 1 <= 2^16). Callers outside these bounds fall back to the
    XLA pipeline, which runs on TPU too — slower, never wrong.
    """
    l = k + w - 1
    C = C or DEF_C
    halo_cap = ROWSTRIPED_MAX_HALO if dna else TAIL
    return l - 1 <= halo_cap and C + w - 1 <= (1 << 16)


def _rowplace_enabled(compact: str, C: int, l: int) -> bool:
    # Whether the row-local compaction applies (shared by the kernel
    # body and the scratch-shape declaration in _invoke_pallas).
    VBITS = (C + l).bit_length()
    return (compact in ROW_COMPACTS
            and C % 128 == 0 and (C & (C - 1)) == 0 and C >= TAIL
            and VBITS + (C - 1).bit_length() <= 32)


def _mxu_paint_enabled(mode: str, compact: str, C: int, l: int) -> bool:
    # The MXU paint splits painted values into 8-bit bf16 limbs: two for
    # the (+1-encoded) block-relative data plane, four for the full-u32
    # super-k-mer index plane (each dot routes at most one nonzero term
    # <= 255 per output lane, so f32 accumulation is exact; limbs are
    # recombined in u32 with multiplies — Mosaic miscompiles vector
    # left-shifts >= 16). Exactness bound for the data plane: enc_max =
    # 8C + l (rowbase 7C + row-relative < C+l, +1 encoding), and the hi
    # limb enc>>8 is only bf16-exact up to 256 — so require
    # enc_max >> 8 <= 256, i.e. 8C + l <= 65791 (l <= 255 at C=8192).
    if compact == "rowf32":
        # f32 one-hot dots (run at precision=HIGHEST: bf16x3 passes are
        # exact for integer values with one-hot routing) represent every
        # painted integer up to 2^24 directly — no limb split, and no
        # l <= 255 degradation: enc_max = 8C + l + 1 just has to fit.
        return (_rowplace_enabled(compact, C, l)
                and 8 * C + l + 1 < (1 << 24))
    return (_rowplace_enabled(compact, C, l)
            and compact in ("rowmxu", "rowsignmxu", "rowmxu2", "rowmxu3",
                            "rowmxu4")
            and 8 * C + l <= 65791)


def _rotl(x, r):
    """rotl32 of uint32 x by r (static int or uint32 array mod 32)."""
    if isinstance(r, int):
        r %= 32
        if r == 0:
            return x
        return (x << U32(r)) | (x >> U32(32 - r))
    r = r % U32(32)
    left = x << r
    right = jnp.where(r == 0, U32(0), x >> (U32(32) - r))
    return left | right


def _win_fold(x, width, op, S):
    """op over sliding windows of `width`: out[:, i] = op(x[:, i..i+width-1]).

    x: (RB, S_pad) with at least S valid columns; result valid for
    S - width + 1 columns. Binary doubling on static lane slices.
    """
    out_len = x.shape[1] - width + 1
    acc = None
    done = 0
    part = x
    d = 1
    while True:
        if width & d:
            seg = part[:, done : done + out_len]
            acc = seg if acc is None else op(acc, seg)
            done += d
        if d * 2 > width:
            break
        L = part.shape[1] - d
        part = op(part[:, :L], part[:, d : d + L])
        d *= 2
    return acc


def _win_min1(elem, w):
    """Single-plane sliding-window u32 min (sparse-table doubling).

    Mosaic has no unsigned vector min: bias through signed space
    (x ^ 0x80000000 preserves unsigned order under signed compare).
    """
    bias = jnp.int32(-(1 << 31))
    f = pltpu.bitcast(elem, jnp.int32) ^ bias
    p = 1
    while p * 2 <= w:
        L = f.shape[1] - p
        f = jnp.minimum(f[:, :L], f[:, p : p + L])
        p *= 2
    Cc = f.shape[1] - (w - p)
    f = jnp.minimum(f[:, :Cc], f[:, w - p : w - p + Cc])
    return pltpu.bitcast(f ^ bias, jnp.uint32)


def _row_shift_down(x, q):
    """Rows move up by q in flat order (row r receives row r+q); bottom wraps."""
    if q == 0:
        return x
    return jnp.concatenate([x[q:], x[:q]], axis=0)


def _roll_flat_left(x, d, C):
    """Roll (RB, C) left by d in row-major flat order (wrap region is dead).

    General d (non-pow2 C reaches d that is neither < C nor a multiple of
    C): shift whole rows by d // C, then rotate columns by d % C."""
    q, rr = divmod(d, C)
    if q:
        x = _row_shift_down(x, q)
    if rr == 0:
        return x
    down = _row_shift_down(x, 1)
    return jnp.concatenate([x[:, rr:], down[:, :rr]], axis=1)


def _flat_cumsum(keep, RB_, C):
    """Inclusive cumsum of (RB, C) int32 in row-major flat order."""
    x = keep
    d = 1
    while d < C:
        x = x + jnp.concatenate([jnp.zeros((RB_, d), I32), x[:, :-d]], axis=1)
        d *= 2
    tot = x[:, C - 1 : C]
    carry = tot
    ri = jax.lax.broadcasted_iota(I32, (RB_, 1), 0)
    d = 1
    while d < RB_:
        shifted = jnp.where(ri >= d, pltpu.roll(carry, d, axis=0), 0)
        carry = carry + shifted
        d *= 2
    # carry is inclusive row-total cumsum; make it exclusive
    return x + (carry - tot)


def _butterfly(planes, shift, C):
    """Left-pack live elements (shift>0 or live-at-rest) of flat (RB,C) planes.

    planes: list of uint32 arrays; dead slots must hold INVALID and shift 0.
    Monotone shifts guarantee no collisions (see ops/layout.butterfly_pack).
    """
    RB_ = planes[0].shape[0]
    s = shift
    total = RB_ * C
    d = 1
    while d < total:
        ss = _roll_flat_left(s, d, C)
        take = (ss & d) != 0
        # hole is only consulted in the take-else branch, so no ~take
        hole = (s & d) != 0
        new_planes = []
        for x in planes:
            xs = _roll_flat_left(x, d, C)
            new_planes.append(jnp.where(take, xs, jnp.where(hole, INVALID, x)))
        planes = new_planes
        s = jnp.where(take, ss - d, jnp.where(hole, 0, s))
        d *= 2
    return planes


def _butterfly_packed(x, C, total):
    """Single-plane left-pack: x = (shift << 16) | local_value, 16 bits each.

    When the block-local value range (BC + l) and the butterfly width BCP
    both fit 16 bits (C <= 4096 with RB = 8: BCP = 36864 < 65536), the
    value and its remaining shift ride ONE u32 plane — half the planes
    and shared take/hole logic, ~2x cheaper than the generic two-plane
    butterfly. Dead slots carry 0xFFFF (shift 0); holes are refilled with
    it. The shift field is adjusted by multiply/subtract only (Mosaic
    miscompiles large vector left-shifts on offset layouts).
    """
    DEAD = U32(0xFFFF)
    d = 1
    while d < total:
        xs = _roll_flat_left(x, d, C)
        take = ((xs >> U32(16)) & U32(d)) != 0
        hole = ((x >> U32(16)) & U32(d)) != 0  # else-branch only
        x = jnp.where(take, xs - U32(d << 16), jnp.where(hole, DEAD, x))
        d *= 2
    return x


def _pack_fold(cs, J, msb):
    """Windowed 2-bit pack over J chars per row (exact width, doubling).

    msb: out[i] = sum_{j<J} cs[i+j] << (30-2j); else LSB-first << (2j).
    Result columns beyond S-J+1 are garbage (callers slice).
    """

    # Mosaic MISCOMPILES left-shifts >= 16 on vectors whose layout carries
    # an unaligned lane offset (silent wrong lanes — caught by
    # tests/test_tpu_hardware.py). Multiplies lower correctly and are
    # bit-identical mod 2^32, so all static left-shifts here are written
    # as multiplies; right-shifts lower fine.
    def shl(x, b):
        return x * U32(1 << b) if b else x

    out_len = cs.shape[1] - J + 1
    acc = None
    done = 0
    part = shl(cs, 30) if msb else cs  # width-1 pack
    d = 1
    while True:
        if J & d:
            shifted = (part >> U32(2 * done)) if msb else shl(part, 2 * done)
            seg = shifted[:, done : done + out_len]
            acc = seg if acc is None else acc | seg
            done += d
        if d * 2 > J:
            break
        L = part.shape[1] - d
        shifted = (part >> U32(2 * d)) if msb else shl(part, 2 * d)
        part = part[:, :L] | shifted[:, d : d + L]
        d *= 2
    return acc


# Hash-fold implementation, module-level like RB so each experiment
# process picks one at trace time (bench/exp_kernel.py --hashimpl).
# "rel" folds with RELATIVE rotations: h[i] = rotl(xor_j rotl(vals[i+j],
# j), rot) — the per-element rotation cancels inside the window, so
# every rotation in the doubling fold is STATIC per stage (multiply|shr,
# no variable shifts, no iota/mod chains, no where-guards) and the final
# constant rotations fold into the table SCALARS. Bit-identical to the
# direct "var" form (tests/test_hash_impl.py); round-5 silicon: verified
# bit-exact on hardware and wins every clean interleaved A/B pair 3/3
# (0.1359/0.1399/0.1378 vs var 0.1400/0.1442/0.1431 ns/bp canonical
# k21 w11, bench/onchip_r5b_results.json time_hash_* rows) -> default.
# CAVEAT: read at TRACE time. Changing it after the first jit trace in a
# process silently keeps the previously-traced implementation (the jit
# cache key does not include it) — set it before any fused call, one
# variant per process.
HASH_IMPL = "rel"


def _rot_static(v, r):
    """rotl32 by a static amount (scalar or vector; multiply, never a
    vector left-shift — Mosaic miscompiles vector shl >= 16 on offset
    layouts)."""
    r %= 32
    if r == 0:
        return v
    return (v * U32(1 << r)) | (v >> U32(32 - r))


def _win_fold_rotxor(x, width, sign):
    """xor over sliding windows with relative rotations:
    out[:, i] = xor_{j<width} rotl32(x[:, i+j], sign*j).

    Doubling: F_{2d}[i] = F_d[i] ^ rotl(F_d[i+d], sign*d); exact-width
    combine like _win_fold. Every rotation is static."""

    def rot(v, r):
        return _rot_static(v, (sign * r) % 32)

    out_len = x.shape[1] - width + 1
    acc = None
    done = 0
    part = x
    d = 1
    while True:
        if width & d:
            seg = rot(part[:, done : done + out_len], done)
            acc = seg if acc is None else acc ^ seg
            done += d
        if d * 2 > width:
            break
        L = part.shape[1] - d
        part = part[:, :L] ^ rot(part[:, d : d + L], d)
        d *= 2
    return acc


def _hash_windows(M_u32, hasher_kind, canonical, rot_offset, k, tab, mul_const, nk_cols):
    """uint32 kmer hashes for nk_cols kmers from the (RB, SP) u32 code block."""
    if HASH_IMPL == "rel" and hasher_kind in ("nt", "mul"):
        rf = rot_offset % 32
        rr = (k - 1 + rot_offset) % 32
        if hasher_kind == "nt":
            c = (M_u32 & U32(3)).astype(I32)
            b0 = (c & 1) != 0
            b1 = (c & 2) != 0
            tf = [_rot_static(tab[i], rf) for i in range(4)]
            vals = jnp.where(b1, jnp.where(b0, tf[3], tf[2]),
                             jnp.where(b0, tf[1], tf[0]))
            h = _win_fold_rotxor(vals, k, +1)
            if canonical:
                # the complement code is c ^ 2: entry i serves code i ^ 2
                tr = [_rot_static(tab[i ^ 2], rr) for i in range(4)]
                cvals = jnp.where(b1, jnp.where(b0, tr[3], tr[2]),
                                  jnp.where(b0, tr[1], tr[0]))
                h = h ^ _win_fold_rotxor(cvals, k, -1)
        else:
            vals = _rot_static((M_u32 + U32(1)) * mul_const, rf)
            h = _win_fold_rotxor(vals, k, +1)
            if canonical:
                cvals = _rot_static(((M_u32 ^ U32(2)) + U32(1)) * mul_const,
                                    rr)
                h = h ^ _win_fold_rotxor(cvals, k, -1)
        return h[:, :nk_cols]
    SP = M_u32.shape[1]
    p = jax.lax.broadcasted_iota(I32, (RB, SP), 1).astype(U32)  # column index
    if hasher_kind == "antilex":
        c = M_u32 & U32(3)
        J = min(k, 16)
        h = ~_pack_fold(c, J, msb=True)
        if canonical:
            cc = c ^ U32(2)
            # ra[i] = sum_{j<J} cc[i+k-1-j] << (30-2j)
            #       = LSBpack_J(cc)[i + k - J] << (32 - 2J)
            Z = _pack_fold(cc, J, msb=False)
            sh = k - J
            if sh:
                Z = jnp.concatenate([Z[:, sh:], Z[:, :sh]], axis=1)
            # multiply, not shift: Z descends from slice views (see
            # _pack_fold note on the Mosaic shift-on-slice miscompile)
            ra = Z * U32(1 << (32 - 2 * J)) if J < 16 else Z
            h = h ^ (~ra)
        return h[:, :nk_cols]
    if hasher_kind == "nt":
        c = (M_u32 & U32(3)).astype(I32)
        b0 = (c & 1) != 0
        b1 = (c & 2) != 0
        t0, t1, t2, t3 = (tab[i] for i in range(4))
        vals = jnp.where(b1, jnp.where(b0, t3, t2), jnp.where(b0, t1, t0))
        cvals = jnp.where(b1, jnp.where(b0, t1, t0), jnp.where(b0, t3, t2))
    else:  # mul
        cu = M_u32
        vals = (cu + U32(1)) * mul_const
        cvals = ((cu ^ U32(2)) + U32(1)) * mul_const
    u = _rotl(vals, (p + U32(rot_offset)) % U32(32))
    X = _win_fold(u, k, jnp.bitwise_xor, None)
    i = p[:, : X.shape[1]] % U32(32)
    h = _rotl(X, (U32(32) - i) % U32(32))
    if canonical:
        ur = _rotl(cvals, (U32((k - 1 + rot_offset) % 32) - p) % U32(32))
        Xr = _win_fold(ur, k, jnp.bitwise_xor, None)
        h = h ^ _rotl(Xr, i)
    return h[:, :nk_cols]


TAIL = 1024  # u32 tile (8, 128): all HBM DMA offsets are TAIL-aligned


def striped_geometry(C: int) -> tuple[int, int, int]:
    """(SLAB chars, SLABW words, SLABW_PAD padded words) per block."""
    SLAB = RB * C + TAIL
    SLABW = SLAB // 16
    SLABW_PAD = -(-SLABW // 1024) * 1024
    return SLAB, SLABW, SLABW_PAD


def striped8_geometry(C: int) -> tuple[int, int, int]:
    """Byte-striped variant (4 chars/word, 8-bit fields): general ASCII."""
    SLAB = RB * C + TAIL
    SLABW = SLAB // 4
    SLABW_PAD = -(-SLABW // 1024) * 1024
    return SLAB, SLABW, SLABW_PAD


def rowstriped_geometry(C: int, PADH: int) -> tuple[int, int, int]:
    """(SP chars/row, SPW words/row, SPW_PAD padded words/row): row-striped
    2-bit input — each lane row's span packed separately so the on-device
    decode runs fully in (RB, lanes) layout. PADH <= 129-char halos give a
    (k,w)-independent layout."""
    SP = C + PADH
    SPW = -(-SP // 16)
    SPW_PAD = -(-SPW // 128) * 128
    return SP, SPW, SPW_PAD


def _make_kernel(k, w, mode, skip_ambiguous, hasher_kind, canonical, rot_offset,
                 C, G, PADH, in_mode="striped2", fold_ascii=False, ablate=None,
                 out_cap=None, compact=None):
    compact = compact or DEF_COMPACT
    l = k + w - 1
    BC = RB * C
    BCP = (RB + 1) * C  # butterfly width incl. the carried-tail row
    SP = C + PADH  # columns per row (>= C + l - 1)
    SLAB, SLABW, SLABW_PAD = striped_geometry(C)  # chars staged per block
    _, SLABW8, SLABW8_PAD = striped8_geometry(C)
    _, SPW, SPW_PAD = rowstriped_geometry(C, PADH)
    # flat striped formats share the one TAIL-aligned slab pad; the 2-D
    # row-striped format carries the halo per row (see ROWSTRIPED_MAX_HALO)
    assert PADH <= (ROWSTRIPED_MAX_HALO if in_mode == "striped2r" else TAIL)
    assert in_mode in ("striped2", "striped2r", "striped8", "i32")
    # the packed sliding-min rides (hash_top16 | column) in one u32, so
    # every in-row kmer column must fit 16 bits. The analog of the
    # reference's w < 2^15 cap (src/sliding_min.rs:93-95); at C=8192 this
    # admits w <= 57345 — wider than the crate, but never silently wrong.
    assert C + w - 1 <= (1 << 16), (
        f"fused kernel supports w <= {(1 << 16) - C + 1} at C={C} "
        "(packed-min column must fit 16 bits); use a smaller C for larger w"
    )
    emit_idx = mode == MODE_SUPERKMERS
    # Reduced output buffers (huge runs where worst-case = #windows would
    # dominate HBM): writes clamp to [0, out_cap - BCP], so an overflow
    # truncates instead of corrupting memory — detectable because the
    # reported count still carries the true total.
    full_cap = G * BC + BCP + TAIL
    out_cap = full_cap if out_cap is None else min(out_cap, full_cap)
    W_MAX = out_cap - BCP - TAIL  # TAIL-aligned by construction below

    rowplace_k = _rowplace_enabled(compact, C, l)
    CHW = 32 if compact == "rowmxu4" else 128  # rank chunk width
    NCH_K = C // CHW if rowplace_k else 0
    # "rank"/"bfly" ablation points only exist inside the row-local
    # compaction; the flat path would silently run the full kernel.
    assert ablate != "bfly" or rowplace_k, \
        "--ablate bfly requires a row-local compact variant"

    # MXU element dtype for the one-hot RANK matmuls (the paint's dtype
    # is chosen separately in the paint section): rowf32 runs f32 dots
    # at precision=HIGHEST (exact to 2^24, no limb splits); rowmxu4 runs
    # s8 x s8 -> s32 dots over 32-wide chunks (exact by range: chunk
    # sums <= 32, offsets split into 7-bit limbs), which shortens the
    # intra-chunk cumsum from 7 roll stages to 5; the bf16 variants stay
    # exact via <= 8-bit limbs over 128-wide chunks.
    MXF = (jnp.float32 if compact == "rowf32"
           else jnp.int8 if compact == "rowmxu4" else jnp.bfloat16)
    HIGHEST = jax.lax.Precision.HIGHEST

    def kernel(nw_ref, tab_ref, mul_ref, ambany_ref, codes_hbm, amb_hbm,
               out_hbm, idx_hbm, count_ref,
               slab0, slab1, amb_slab0, amb_slab1, outbuf, idxbuf, tailbuf,
               tailbuf2, state, *rest):
        # conditional scratch unpack — mirror _invoke_pallas's
        # scratch_shapes order exactly
        rest = list(rest)
        e_scr = e2_scr = p_scr = i_scr = skipm_scr = None
        if rowplace_k:
            e_scr = rest.pop(0)
            e2_scr = rest.pop(0)
            if (_mxu_paint_enabled(mode, compact, C, l)
                    and compact != "rowmxu2"):
                p_scr = rest.pop(0)
                if mode == MODE_SUPERKMERS:
                    i_scr = rest.pop(0)
        if skip_ambiguous:
            skipm_scr = rest.pop(0)
        sem_in, sem, sem2 = rest
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            state[0] = 0  # total kept
            state[1] = -1  # dedup seam: INVALID (0xffffffff) as i32 bits
            if rowplace_k:
                # one-hot expand/collapse matrices for the MXU rank are
                # grid-invariant; build ONCE into VMEM scratch (Mosaic
                # does not hoist across grid steps — rebuilding the
                # ~1M-element (C, NCH) planes per block measurably costs)
                jE = jax.lax.broadcasted_iota(I32, (C, NCH_K), 0) // CHW
                mE = jax.lax.broadcasted_iota(I32, (C, NCH_K), 1)
                e_scr[...] = (jE == mE).astype(MXF)
                jE2 = jax.lax.broadcasted_iota(I32, (NCH_K, C), 1) // CHW
                mE2 = jax.lax.broadcasted_iota(I32, (NCH_K, C), 0)
                e2_scr[...] = (jE2 == mE2).astype(MXF)

        # Active-block gating: grids are power-of-two bucketed to bound
        # Mosaic recompiles, so G may over-provision. Active blocks form a
        # contiguous prefix (those with any window < nw); dead blocks skip
        # compute, input DMA, and output appends entirely, costing a few
        # SMEM compares each instead of a full block of work.
        nw_total = nw_ref[0]
        active = g * BC < nw_total
        prev_active = (g > 0) & ((g - 1) * BC < nw_total)

        # Aligned-append state: W = aligned write base, rem = tail carried
        # in out[W : W + rem] (re-read below; alignment keeps Mosaic happy).
        total = state[0]
        W = (total // TAIL) * TAIL
        rem = total - W
        # clamp only the append offsets; min BEFORE the *TAIL so Mosaic can
        # still prove the DMA offset is tile-aligned
        Wdma = jnp.minimum(total // TAIL, W_MAX // TAIL) * TAIL

        # ---- double-buffered input DMA ----
        # packed_in: striped 2-bit words (16 chars/word, char t of word m at
        # chars[t*SLABW + m]) decoded in VMEM via tile-repeat + shift —
        # 0.29 B/bp of HBM read. Otherwise one-char-per-i32 (u8 HBM slices
        # don't tile-align for the DMA engine). All offsets/lengths are
        # (8,128)-tile multiples. Block g+1's slab loads during block g's
        # compute (two slots; the output append stays serial because the
        # aligned-append tail re-read depends on it).
        def in_copy(blk, slot_ref, slot):
            if in_mode == "striped2":
                src = codes_hbm.at[pl.ds(blk * SLABW_PAD, SLABW_PAD)]
            elif in_mode == "striped2r":
                # 2-D input (G*RB, SPW_PAD): row offsets are multiples of
                # RB=8, so the (8,128) tiling stays provably aligned
                src = codes_hbm.at[pl.ds(blk * RB, RB), :]
            elif in_mode == "striped8":
                src = codes_hbm.at[pl.ds(blk * SLABW8_PAD, SLABW8_PAD)]
            else:
                src = codes_hbm.at[pl.ds(blk * BC, SLAB)]
            return pltpu.make_async_copy(src, slot_ref, sem_in.at[slot])

        def amb_copy(blk, slot_ref, slot):
            # same double-buffered schedule as in_copy, on the ambiguity
            # plane (identical wire format); its starts/waits are
            # additionally gated on the prefetched per-block any-ambiguity
            # scalar so clean blocks pay nothing
            if in_mode == "striped2":
                src = amb_hbm.at[pl.ds(blk * SLABW_PAD, SLABW_PAD)]
            elif in_mode == "striped2r":
                src = amb_hbm.at[pl.ds(blk * RB, RB), :]
            elif in_mode == "striped8":
                src = amb_hbm.at[pl.ds(blk * SLABW8_PAD, SLABW8_PAD)]
            else:
                src = amb_hbm.at[pl.ds(blk * BC, SLAB)]
            return pltpu.make_async_copy(src, slot_ref, sem2.at[slot])

        # Gate on `active` too: a zero-window launch (nw_total <= 0 happens
        # for over-provisioned shards in fused_sharded_sketch) never runs
        # body(), so an unconditional start here would leave the DMA
        # pending at kernel exit — undefined behavior on real TPUs.
        @pl.when((g == 0) & active)
        def _():
            in_copy(0, slab0, 0).start()

        even = g % 2 == 0
        next_active = (g + 1 < G) & ((g + 1) * BC < nw_total)

        @pl.when(next_active & even)
        def _():
            in_copy(g + 1, slab1, 1).start()

        @pl.when(next_active & (~even))
        def _():
            in_copy(g + 1, slab0, 0).start()

        if skip_ambiguous:
            # ambany_ref is (G + 1,) with a trailing 0 so the g + 1 probe
            # below stays in bounds on the last block
            @pl.when((g == 0) & active & (ambany_ref[0] != 0))
            def _():
                amb_copy(0, amb_slab0, 0).start()

            next_amb = next_active & (ambany_ref[g + 1] != 0)

            @pl.when(next_amb & even)
            def _():
                amb_copy(g + 1, amb_slab1, 1).start()

            @pl.when(next_amb & (~even))
            def _():
                amb_copy(g + 1, amb_slab0, 0).start()

        # The first dead block absorbs the last active block's pending
        # pipelined output-append wait(s); later dead blocks have nothing
        # pending (wait descriptors only need the semaphore + size).
        if ablate is None:
            @pl.when((~active) & prev_active)
            def _():
                pltpu.make_async_copy(
                    outbuf, out_hbm.at[pl.ds(Wdma, BCP)], sem).wait()
                if emit_idx:
                    pltpu.make_async_copy(
                        idxbuf, idx_hbm.at[pl.ds(Wdma, BCP)], sem).wait()

        def body():
            # The append tail lives in the persistent tailbuf/tailbuf2 VMEM
            # scratch (extracted from each block's packed output in finish).
            if skip_ambiguous:
                # the amb slab was prefetched by the previous block (or the
                # g == 0 preamble) iff this block has any ambiguity; clean
                # blocks have nothing in flight and skip decode+fold too
                amb_present = ambany_ref[g] != 0

                @pl.when(amb_present & even)
                def _():
                    amb_copy(g, amb_slab0, 0).wait()

                @pl.when(amb_present & (~even))
                def _():
                    amb_copy(g, amb_slab1, 1).wait()

            @pl.when(even)
            def _():
                in_copy(g, slab0, 0).wait()

            @pl.when(~even)
            def _():
                in_copy(g, slab1, 1).wait()

            # ---- lane matrix (RB, SP): row r = chars[r*C : r*C + SP] ----
            def lane_matrix_from(val, fold=False):
                if in_mode == "striped2r":
                    # fully (RB, lanes)-shaped decode: no single-sublane
                    # intermediate, no per-row slice+concat
                    ww = val[:, :SPW]
                    X = pltpu.repeat(ww, 16, axis=1)  # X[:, t*SPW+m] = ww[:, m]
                    t = jax.lax.broadcasted_iota(I32, (RB, 16 * SPW), 1) // SPW
                    chars = (X >> (U32(2) * t.astype(U32))) & U32(3)
                    return chars[:, :SP]
                if in_mode == "striped2":
                    ww = val.reshape(1, SLABW_PAD)[:, :SLABW]
                    X = pltpu.repeat(ww, 16, axis=1)  # X[:, t*SLABW + m] = word m
                    t = jax.lax.broadcasted_iota(I32, (1, 16 * SLABW), 1) // SLABW
                    chars = (X >> (U32(2) * t.astype(U32))) & U32(3)  # natural order
                elif in_mode == "striped8":
                    ww = val.reshape(1, SLABW8_PAD)[:, :SLABW8]
                    X = pltpu.repeat(ww, 4, axis=1)  # X[:, t*SLABW8 + m] = word m
                    t = jax.lax.broadcasted_iota(I32, (1, 4 * SLABW8), 1) // SLABW8
                    chars = (X >> (U32(8) * t.astype(U32))) & U32(0xFF)
                else:
                    v2 = val.reshape(1, val.shape[0]).astype(U32)
                    chars = v2
                if fold:
                    # on-device ASCII-DNA fold: (c >> 1) & 3, the packed-seq
                    # code mapping (/root/reference/src/lib.rs:121-128)
                    chars = (chars >> U32(1)) & U32(3)
                rows = [chars[:, r * C : r * C + SP] for r in range(RB)]
                return jnp.concatenate(rows, axis=0)

            M = lane_matrix_from(jnp.where(even, slab0[...], slab1[...]),
                                 fold=fold_ascii)

            def _ablate_out(x):
                # bench-only: checksum a stage's result and stop (prevents DCE)
                state[0] = jnp.sum(pltpu.bitcast(x, jnp.int32) & 0xFF)

            if ablate == "decode":
                _ablate_out(M)
                return

            base = g * BC  # first window/kmer of this block (int32)
            tab = [tab_ref[i] for i in range(4)]
            mulc = mul_ref[0]

            # ---- hashes for C + w - 1 kmers per row ----
            nkc = C + w - 1
            h = _hash_windows(M, hasher_kind, canonical, rot_offset, k, tab, mulc, nkc)
            if ablate == "hash":
                _ablate_out(h)
                return
            hv = h & TOP16
            j = jax.lax.broadcasted_iota(I32, (RB, nkc), 1)
            r = jax.lax.broadcasted_iota(I32, (RB, nkc), 0)
            off = nw_ref[1].astype(U32)  # global char offset (u32 bits)
            nk = nw_total + I32(w - 1)  # kmers
            kidx = base + r * C + j  # call-local kmer index
            hv = jnp.where(kidx < nk, hv, INVALID)
            # ---- sliding window minima ----
            # The reference's 16-bit position-packing trick
            # (src/sliding_min.rs:104-106), wrap-free here because the packed
            # index is the block-local kmer COLUMN (< C + w - 1 < 2^16): a
            # single-plane u32 min realizes the exact (top16-hash, leftmost)
            # order; for the rightmost arm the column is complemented. Invalid
            # kmers carry hv = 0xFFFFFFFF, which already dominates both
            # encodings (|j keeps it max).
            ju = j.astype(U32)
            elemL = hv | ju
            lcol = _win_min1(elemL, w)[:, :C] & U32(0xFFFF)
            rw_c = jax.lax.broadcasted_iota(I32, (RB, C), 0)
            rowbase = (base + rw_c * C).astype(U32) + off  # (RB, C) global row starts
            lpos = rowbase + lcol
            if ablate == "minl":  # L-arm sparse-table min only
                _ablate_out(lpos)
                return
            if canonical:
                # hv's low 16 bits are zero and ju <= 0xFFFF, so
                # hv | (0xFFFF - ju) == elemL ^ 0xFFFF — one op, no
                # second iota chain
                elemR = elemL ^ U32(0xFFFF)
                rcol = U32(0xFFFF) - (_win_min1(elemR, w)[:, :C] & U32(0xFFFF))
                rpos = rowbase + rcol
                tg = ((M >> U32(1)) & U32(1)).astype(I32)
                cnt = _win_fold(tg, l, jnp.add, None)[:, :C]
                sel = jnp.where(2 * cnt > l, lpos, rpos)
            else:
                sel = lpos
            if ablate == "blend":  # both min arms + strand blend
                _ablate_out(sel)
                return

            if skip_ambiguous:
                # per-block gate: only blocks whose slab (halo included —
                # each packed row spans C + PADH chars) contains ambiguity
                # pay the decode + windowed-count fold; the rest write a
                # zero mask. Both branches fill skipm_scr (pl.when regions
                # cannot return values).
                @pl.when(amb_present)
                def _():
                    aslab = jnp.where(even, amb_slab0[...], amb_slab1[...])
                    A = (lane_matrix_from(aslab) & U32(1)).astype(I32)
                    acnt = _win_fold(A, l, jnp.add, None)[:, :C]
                    skipm_scr[...] = jnp.minimum(acnt, 1)

                @pl.when(~amb_present)
                def _():
                    skipm_scr[...] = jnp.zeros((RB, C), I32)

                sel = jnp.where(skipm_scr[...] != 0, SKIPPED, sel)

            # ---- validity + seam-aware keep mask ----
            jw = jax.lax.broadcasted_iota(I32, (RB, C), 1)
            rw = jax.lax.broadcasted_iota(I32, (RB, C), 0)
            widx = base + rw * C + jw
            valid = widx < nw_total
            sel = jnp.where(valid, sel, INVALID)
            gw = widx.astype(U32) + off

            if mode in (MODE_CLOSED_SYNCMERS, MODE_OPEN_SYNCMERS):
                if mode == MODE_OPEN_SYNCMERS:
                    is_sync = sel == gw + U32(w // 2)
                else:
                    is_sync = (sel == gw) | (sel == gw + U32(w - 1))
                keep = valid & is_sync & (sel != SKIPPED)
                vals0 = gw
            else:
                # prev in flat order: (r, j) <- (r, j-1); (r, 0) <- (r-1, C-1);
                # (0, 0) <- the seam carried in SMEM. Built from two wrapping
                # rolls + selects (skinny concats don't lower on Mosaic).
                rolled = pltpu.roll(sel, 1, axis=1)  # (r,0) <- sel[r, C-1]
                colfix = pltpu.roll(rolled, 1, axis=0)  # (r,0) <- sel[r-1, C-1]
                seam_u = state[1].astype(U32)  # i32 bits -> u32 scalar
                prev = jnp.where(jw == 0, colfix, rolled)
                prev = jnp.where((jw == 0) & (rw == 0), seam_u, prev)
                keep = valid & (sel != prev)
                if skip_ambiguous:
                    keep = keep & (sel != SKIPPED)
                vals0 = sel

            def finish(packed, total_new):
                """Aligned append of the packed block + SMEM state update
                (shared by both compaction variants)."""
                if ablate == "pack":
                    _ablate_out(packed[0])
                    return
                # ---- aligned append (pipelined): the new tail is extracted
                # IN VMEM from the just-packed block (out[W'..W'+1024) lies
                # inside [W, W+BCP), at a TAIL-aligned offset), so this
                # block's write only has to complete before the NEXT block's
                # write starts (overlapping regions: g's INVALID tail is
                # overwritten by g+1). The wait for write g-1 therefore
                # lands after block g's compute. The super-k-mer idx plane
                # writes ride the SAME semaphore: both descriptors carry
                # equal (BCP-word) amounts and we always wait for both
                # before touching either buffer, so mixed completion order
                # cannot release a wait early.
                @pl.when(g > 0)  # g-1's writes still read outbuf/idxbuf
                def _():
                    pltpu.make_async_copy(
                        outbuf, out_hbm.at[pl.ds(Wdma, BCP)], sem).wait()
                    if emit_idx:
                        pltpu.make_async_copy(
                            idxbuf, idx_hbm.at[pl.ds(Wdma, BCP)], sem).wait()

                outbuf[:] = packed[0].reshape(BCP)
                if emit_idx:
                    idxbuf[:] = packed[1].reshape(BCP)
                W_next = (total_new // TAIL) * TAIL
                # new tail = packed flat [delta, delta+TAIL), delta TAIL-
                # aligned; dynamic VMEM reads/DMA don't lower, so select
                # among the static TAIL-aligned candidate slots.
                slot_idx = (W_next - W) // TAIL
                acc = jnp.zeros((1, TAIL), U32)
                acc2 = jnp.zeros((1, TAIL), U32)
                for cslot in range(BCP // TAIL):
                    rr, col = divmod(cslot * TAIL, C)
                    hitslot = slot_idx == cslot
                    cand = packed[0][rr : rr + 1, col : col + TAIL]
                    acc = jnp.where(hitslot, cand, acc)
                    if emit_idx:
                        cand2 = packed[1][rr : rr + 1, col : col + TAIL]
                        acc2 = jnp.where(hitslot, cand2, acc2)
                tailbuf[:] = acc.reshape(TAIL)
                if emit_idx:
                    tailbuf2[:] = acc2.reshape(TAIL)
                pltpu.make_async_copy(
                    outbuf, out_hbm.at[pl.ds(Wdma, BCP)], sem).start()
                if emit_idx:
                    pltpu.make_async_copy(
                        idxbuf, idx_hbm.at[pl.ds(Wdma, BCP)], sem).start()

                @pl.when(g == G - 1)  # dead blocks otherwise absorb this
                def _():
                    pltpu.make_async_copy(
                        outbuf, out_hbm.at[pl.ds(Wdma, BCP)], sem).wait()
                    if emit_idx:
                        pltpu.make_async_copy(
                            idxbuf, idx_hbm.at[pl.ds(Wdma, BCP)], sem).wait()

                state[0] = total_new
                # seam for the next block: sel of this block's last window
                # slot ((1,1) slice-reduce; u32 reductions don't lower)
                sel_bits = pltpu.bitcast(sel, jnp.int32)
                state[1] = jnp.sum(sel_bits[RB - 1 :, C - 1 :])

            # ---- compact: rank + pack + tail overlay ----
            jt = jax.lax.broadcasted_iota(I32, (1, C), 1)
            keep_t = jt < rem
            if ablate == "sel":
                _ablate_out(jnp.where(keep, vals0, INVALID))
                return

            # Row-local compaction ("rowplace"): each data row packs its
            # kept elements locally with a 12-stage in-row butterfly (no
            # cross-row wrap logic), ranks come from an MXU-assisted
            # hierarchy (7 intra-128 cumsum stages + chunk-sum / offset /
            # expand matmuls on bf16 one-hot matrices, exact by
            # construction), and the packed row prefixes are painted into
            # the output plane at their scalar flat offsets with one
            # dynamic pltpu.roll per row. This replaces the flat scheme's
            # 12-stage full-width cumsum + 16-stage flat butterfly
            # (measured 0.046 + 0.076 ns/bp at k21 w11 canonical).
            # Field layout: values are ROW-relative (< C + l), so the
            # packed (shift | value) plane fits u32 for any C up to 2^13
            # (VBITS value bits + log2(C) shift bits <= 32) — unlike the
            # flat scheme, whose block-relative values cap C at 4096.
            VBITS = (C + l).bit_length()
            if rowplace_k:
                VMASK = U32((1 << VBITS) - 1)
                NCH = C // CHW
                BF16 = jnp.bfloat16
                base_off = jnp.int32(base).astype(U32) + off
                # --- intra-chunk inclusive cumsum of keep: log2(CHW)
                # roll stages (7 at the bf16 chunk width 128; 5 under
                # rowmxu4's int8 32-wide chunks) ---
                lane_mod = jax.lax.broadcasted_iota(I32, (RB, C), 1) % CHW
                xint = keep.astype(I32)
                d = 1
                while d < CHW:
                    xint = xint + jnp.where(
                        lane_mod >= d, pltpu.roll(xint, d, axis=1), 0)
                    d *= 2
                # --- chunk sums / exclusive chunk offsets on the MXU ---
                # one-hot matrices cached in VMEM scratch at g==0; all
                # products are 0/1 or small exact bf16 ints with f32
                # accumulation, so every dot is bit-exact (chunk sums
                # <= 128; offsets split into 8-bit bf16 limbs for the
                # expand dot). T is (NCH, NCH)-tiny: built per block.
                E = e_scr[...]                         # (C, NCH)
                E2 = e2_scr[...]                       # (NCH, C)
                aT = jax.lax.broadcasted_iota(I32, (NCH, NCH), 0)
                bT = jax.lax.broadcasted_iota(I32, (NCH, NCH), 1)
                T = (aT < bT).astype(MXF)              # strict: exclusive scan
                dn = (((1,), (0,)), ((), ()))
                if compact == "rowmxu4":
                    # s8 x s8 -> s32 dots, exact by range: chunk sums
                    # <= CHW = 32, exclusive offsets <= C split into
                    # 7-bit limbs (<= 127 / <= 64) for the expand dots
                    S8 = jnp.int8
                    ch = jax.lax.dot_general(
                        keep.astype(S8), E, dn,
                        preferred_element_type=I32)          # (RB, NCH)
                    ch_off = jax.lax.dot_general(
                        ch.astype(S8), T, dn,
                        preferred_element_type=I32)          # exclusive
                    cho_i = ch_off                           # <= BC, exact
                    hi = (cho_i >> 7).astype(S8)             # <= 64
                    lo = (cho_i & 127).astype(S8)            # <= 127
                    expand = (
                        jax.lax.dot_general(
                            hi, E2, dn,
                            preferred_element_type=I32) * 128
                        + jax.lax.dot_general(
                            lo, E2, dn,
                            preferred_element_type=I32))     # (RB, C)
                elif compact == "rowf32":
                    # f32 dots at HIGHEST precision are exact to 2^24:
                    # chunk offsets (<= C) feed the expand dot directly —
                    # no 8-bit limb split, one expand dot instead of two
                    ch = jax.lax.dot_general(
                        keep.astype(MXF), E, dn,
                        preferred_element_type=jnp.float32,
                        precision=HIGHEST)                   # (RB, NCH)
                    ch_off = jax.lax.dot_general(
                        ch, T, dn,
                        preferred_element_type=jnp.float32,
                        precision=HIGHEST)                   # exclusive
                    cho_i = ch_off.astype(I32)               # <= BC, exact
                    expand = jax.lax.dot_general(
                        ch_off, E2, dn,
                        preferred_element_type=jnp.float32,
                        precision=HIGHEST).astype(I32)       # (RB, C)
                else:
                    ch = jax.lax.dot_general(
                        keep.astype(BF16), E, dn,
                        preferred_element_type=jnp.float32)  # (RB, NCH)
                    ch_off = jax.lax.dot_general(
                        ch.astype(BF16), T, dn,
                        preferred_element_type=jnp.float32)  # exclusive
                    cho_i = ch_off.astype(I32)               # <= BC, exact
                    # 8-bit limbs: bf16 represents integers exactly only
                    # up to 256, and cho_i <= C can need up to 14 bits
                    hi = (cho_i >> 8).astype(BF16)           # <= 128
                    lo = (cho_i & 255).astype(BF16)          # <= 255
                    expand = (
                        jax.lax.dot_general(
                            hi, E2, dn,
                            preferred_element_type=jnp.float32)
                        * jnp.float32(256)
                        + jax.lax.dot_general(
                            lo, E2, dn,
                            preferred_element_type=jnp.float32)
                    ).astype(I32)                            # (RB, C)
                rank_row = xint + expand                     # inclusive in-row
                if ablate == "rank":
                    _ablate_out(rank_row)
                    return
                # --- row totals, exclusive row offsets (tail first) ---
                rt = (ch_off[:, NCH - 1:] + ch[:, NCH - 1:]).astype(I32)
                rc = rt
                ri1 = jax.lax.broadcasted_iota(I32, (RB, 1), 0)
                d = 1
                while d < RB:
                    rc = rc + jnp.where(ri1 >= d, pltpu.roll(rc, d, axis=0), 0)
                    d *= 2
                ro = rc - rt + rem                           # (RB, 1)
                total_new = W + rem + jnp.sum(rc[RB - 1:, :])
                # --- log2(C)-stage row-local packed butterfly ---
                # shift < C rides bits >= VBITS; the ROW-relative value
                # (vals0 - rowstart < C + l) rides the low VBITS
                shift_r = jnp.where(keep, jw - (rank_row - 1), 0)
                DEADP = VMASK  # > any real row-relative value: no alias
                rowbase_u = (rw * C).astype(U32)
                # "rowsign" variants park the shift field at the TOP of
                # the word (bit 32-SBITS), so each stage's take/hole test
                # is one multiply + one signed compare (stage bit lands
                # at the sign) instead of shift+and+compare. Fits iff
                # VBITS + SBITS <= 32 — the same _rowplace_enabled bound.
                sign_take = compact in ("rowsign", "rowsignmxu")
                mxu_paint = _mxu_paint_enabled(mode, compact, C, l)
                SBITS = (C - 1).bit_length()
                SHBASE = (32 - SBITS) if sign_take else VBITS
                xp = jnp.where(
                    keep,
                    ((vals0 - base_off - rowbase_u) & VMASK)
                    | (shift_r.astype(U32) * U32(1 << SHBASE)),
                    DEADP)
                # Super-k-mers carry the global window index as a second
                # plane moved in LOCKSTEP with xp: the take/hole routing
                # is read off xp's shift field each stage, so xi needs no
                # encoding of its own (full-u32 values ride unpacked;
                # garbage at non-kept lanes never lands below rt).
                xi = gw if emit_idx else None
                def rollrow(x, dd):
                    if dd >= C:
                        return jnp.full((RB, C), DEADP, U32)
                    return jnp.concatenate(
                        [x[:, dd:], jnp.full((RB, dd), DEADP, U32)], axis=1)

                if compact == "rowplace4":
                    # radix-4: half the stages, 3 rolls + a 4-way select
                    # each. Collision-free by the same monotone rank-shift
                    # argument as radix-2 (two candidates claiming one
                    # slot would need a shift difference outside
                    # [0, pos_gap - 1], impossible for dedup'd ranks).
                    # MEASURED SLOWER than radix-2 (0.1902 vs 0.1787
                    # ns/bp at C=8192): the extra rolls cost more than
                    # the stages saved. Kept as a documented experiment
                    # (bench/exp_kernel.py --compact rowplace4).
                    sbit = 0  # bit offset of this stage's base-4 digit
                    d = 1
                    while d < C:
                        xs1 = rollrow(xp, d)
                        xs2 = rollrow(xp, 2 * d)
                        xs3 = rollrow(xp, 3 * d)

                        def dig(x):
                            return (x >> U32(VBITS + sbit)) & U32(3)

                        t1 = dig(xs1) == U32(1)
                        t2 = dig(xs2) == U32(2)
                        t3 = dig(xs3) == U32(3)
                        hole = dig(xp) != U32(0)  # innermost else only
                        if emit_idx:
                            xi = jnp.where(
                                t3, rollrow(xi, 3 * d),
                                jnp.where(t2, rollrow(xi, 2 * d),
                                          jnp.where(t1, rollrow(xi, d), xi)))
                        xp = jnp.where(
                            t3, xs3 - U32((3 * d) << VBITS),
                            jnp.where(
                                t2, xs2 - U32((2 * d) << VBITS),
                                jnp.where(
                                    t1, xs1 - U32(d << VBITS),
                                    jnp.where(hole, DEADP, xp))))
                        d *= 4
                        sbit += 2
                elif sign_take:
                    b = 0
                    while (1 << b) < C:
                        d = 1 << b
                        xs = rollrow(xp, d)
                        # stage bit b sits at bit 32-SBITS+b; multiply by
                        # 1 << (SBITS-1-b) parks it at the sign bit
                        f = U32(1 << (SBITS - 1 - b))
                        take = pltpu.bitcast(xs * f, jnp.int32) < 0
                        hole = pltpu.bitcast(xp * f, jnp.int32) < 0  # else-branch only
                        if emit_idx:
                            xi = jnp.where(take, rollrow(xi, d), xi)
                        xp = jnp.where(
                            take, xs - U32((d << SHBASE) & 0xFFFFFFFF),
                            jnp.where(hole, DEADP, xp))
                        b += 1
                else:
                    d = 1
                    while d < C:
                        xs = rollrow(xp, d)
                        take = ((xs >> U32(VBITS)) & U32(d)) != 0
                        hole = ((xp >> U32(VBITS)) & U32(d)) != 0  # else-branch only
                        if emit_idx:
                            xi = jnp.where(take, rollrow(xi, d), xi)
                        xp = jnp.where(take, xs - U32(d << VBITS),
                                       jnp.where(hole, DEADP, xp))
                        d *= 2
                if ablate == "bfly":
                    _ablate_out(xp)
                    return
                # --- paint packed rows at their flat offsets ---
                # re-attach the row base and encode +1 so 0 means empty;
                # each lane of the rolled row targets output row q or q+1
                enc = jnp.where(jw < rt,
                                (xp & VMASK) + rowbase_u + U32(1), U32(0))
                riP = jax.lax.broadcasted_iota(I32, (RB + 1, C), 0)
                jP1 = jax.lax.broadcasted_iota(I32, (1, C), 1)
                logC = C.bit_length() - 1

                def overlay_finish(acc, acc_i):
                    # Shared by every paint variant: overlay the carried
                    # tail as the (decoded) head of row 0, decode the +1
                    # encoding, and hand off to the aligned append.
                    trow = tailbuf[:].reshape(1, TAIL)
                    if C > TAIL:
                        trow = jnp.concatenate(
                            [trow, jnp.full((1, C - TAIL), INVALID, U32)],
                            axis=1)
                    data = jnp.where(acc == U32(0), INVALID,
                                     acc - U32(1) + base_off)
                    jPfull = jax.lax.broadcasted_iota(I32, (RB + 1, C), 1)
                    tailmask = (riP == 0) & (jPfull < rem)
                    packed = [jnp.where(tailmask, trow, data)]
                    if emit_idx:
                        trow2 = tailbuf2[:].reshape(1, TAIL)
                        if C > TAIL:
                            trow2 = jnp.concatenate(
                                [trow2,
                                 jnp.full((1, C - TAIL), INVALID, U32)],
                                axis=1)
                        packed.append(jnp.where(tailmask, trow2, acc_i))
                    finish(packed, total_new)

                if mxu_paint:
                    # Per-row dynamic rolls land in VMEM scratch at
                    # STATIC row indices (dynamic-index VMEM stores don't
                    # lower; here the store row == r), then two tiny
                    # (RB+1, RB) one-hot matmuls place each rolled row's
                    # head (lanes >= cc, output row q) and wrapped tail
                    # (lanes < cc, row q+1) — replacing RB full-plane
                    # masked adds. 8-bit limbs keep the dots bit-exact:
                    # enc <= 8C + l + 1, so hi = enc>>8 <= 256 (a power
                    # of two, exactly representable in bf16) and each
                    # output lane receives exactly one nonzero term.
                    # idx plane: masked to the packed prefix so
                    # untargeted lanes only ever route zeros
                    enc_i = (jnp.where(jw < rt, xi, U32(0))
                             if emit_idx else None)
                    qv = ro >> logC                       # (RB, 1)
                    ccv = ro - (qv << logC)               # (RB, 1)
                    if compact == "rowmxu2":
                        # fully vectorized staging: decompose each row's
                        # lane rotation cc into log2(C) conditional
                        # full-plane rolls by 2^b (no per-row scalar
                        # extraction, no VMEM scratch round trip)
                        R = enc
                        Ri = enc_i if emit_idx else None
                        for b in range(logC):
                            bitm = ((ccv >> b) & 1) != 0  # (RB,1) bcast
                            R = jnp.where(
                                bitm, pltpu.roll(R, 1 << b, axis=1), R)
                            if emit_idx:
                                Ri = jnp.where(
                                    bitm, pltpu.roll(Ri, 1 << b, axis=1),
                                    Ri)
                    else:
                        for r in range(RB):
                            cc = jnp.sum(ccv[r : r + 1, :1])  # scalar
                            p_scr[r : r + 1, :] = pltpu.roll(
                                enc[r : r + 1], cc, axis=1)
                            if emit_idx:
                                i_scr[r : r + 1, :] = pltpu.roll(
                                    enc_i[r : r + 1], cc, axis=1)
                        R = p_scr[...]
                    jR = jax.lax.broadcasted_iota(I32, (RB, C), 1)
                    headm = jR >= ccv
                    Rh = jnp.where(headm, R, U32(0))
                    Rt = jnp.where(headm, U32(0), R)
                    BF16 = jnp.bfloat16
                    if compact == "rowf32":
                        # f32 single-dot paint: enc <= 8C + l + 1 < 2^24
                        # is exactly representable in f32, so the
                        # head/tail planes ride ONE (RB+1, 2RB) x (2RB, C)
                        # dot with no limb split at all (rowmxu3 needs
                        # hi/lo 8-bit limbs to stay exact in bf16 — twice
                        # the stacked rows plus extraction and pre-scale).
                        # precision=HIGHEST keeps the f32 product passes
                        # exact; each output lane still receives exactly
                        # one nonzero routed term. A2 is built with i32
                        # arithmetic only (i1 vectors on sub-tile shapes
                        # don't lower).
                        R2 = jnp.concatenate([Rh, Rt], axis=0)
                        R2f = R2.astype(I32).astype(jnp.float32)
                        K2 = 2 * RB
                        riA2 = jax.lax.broadcasted_iota(
                            I32, (RB + 1, K2), 0)
                        jA2 = jax.lax.broadcasted_iota(
                            I32, (RB + 1, K2), 1)
                        cmod2 = jA2 % RB
                        half2 = jA2 // RB          # 0 = head, 1 = tail
                        A2I = jnp.zeros((RB + 1, K2), I32)
                        for r in range(RB):
                            q = jnp.sum(qv[r : r + 1, :1])  # scalar
                            A2I = A2I + (
                                (1 - jnp.minimum(jnp.abs(cmod2 - r), 1))
                                * (1 - jnp.minimum(
                                    jnp.abs(riA2 - (q + half2)), 1)))
                        A2 = A2I.astype(jnp.float32)
                        dnA = (((1,), (0,)), ((), ()))
                        acc = jax.lax.dot_general(
                            A2, R2f, dnA,
                            preferred_element_type=jnp.float32,
                            precision=HIGHEST
                        ).astype(I32).astype(U32)
                        if emit_idx:
                            # full-u32 idx plane: two 16-bit limbs (each
                            # <= 65535 < 2^24, f32-exact) through the
                            # same A2 — two dots on (2RB, C) planes
                            # instead of rowmxu3's two dots on (4RB, C)
                            # 8-bit limb stacks; recombined with a u32
                            # multiply (vector left-shifts >= 16
                            # miscompile)
                            Ri = i_scr[...]
                            R2i = jnp.concatenate(
                                [jnp.where(headm, Ri, U32(0)),
                                 jnp.where(headm, U32(0), Ri)], axis=0)
                            lo16 = (R2i & U32(0xFFFF)).astype(I32).astype(
                                jnp.float32)
                            hi16 = (R2i >> U32(16)).astype(I32).astype(
                                jnp.float32)
                            dlo = jax.lax.dot_general(
                                A2, lo16, dnA,
                                preferred_element_type=jnp.float32,
                                precision=HIGHEST).astype(I32).astype(U32)
                            dhi = jax.lax.dot_general(
                                A2, hi16, dnA,
                                preferred_element_type=jnp.float32,
                                precision=HIGHEST).astype(I32).astype(U32)
                            acc_i = dhi * U32(1 << 16) + dlo
                        overlay_finish(acc, acc_i if emit_idx else None)
                        return
                    if compact in ("rowmxu3", "rowmxu4"):
                        # Stacked single-dot paint: head/tail AND hi/lo
                        # limbs ride the CONTRACTION axis of one
                        # (RB+1, 4RB) x (4RB, C) dot — the MXU pads the
                        # contraction to a full tile either way, so
                        # stacking is free and replaces rowmxu's four
                        # dots + per-plane limb extraction with one dot.
                        # R4 rows: [Rh_hi<<8; Rt_hi<<8; Rh_lo; Rt_lo] —
                        # the hi limb is pre-scaled ON THE INPUT side
                        # (hi*256 = enc & ~255 <= 65536 keeps <= 8
                        # significand bits, bf16-exact), so each output
                        # lane accumulates its element's hi and lo terms
                        # in f32 (sum <= 8C + l < 2^24, exact) and the
                        # (9, C) f32 recombine disappears. A4 column k
                        # routes source row k % RB, head/tail by
                        # (k // RB) & 1; built with i32 arithmetic only
                        # (i1 vectors on sub-tile shapes don't lower).
                        R2 = jnp.concatenate([Rh, Rt], axis=0)
                        hi2 = (R2 & U32(0xFFFFFF00)).astype(I32)
                        lo2 = (R2 & U32(255)).astype(I32)
                        R4 = jnp.concatenate(
                            [hi2, lo2], axis=0).astype(BF16)
                        K4 = 4 * RB
                        riA4 = jax.lax.broadcasted_iota(
                            I32, (RB + 1, K4), 0)
                        jA4 = jax.lax.broadcasted_iota(
                            I32, (RB + 1, K4), 1)
                        cmod = jA4 % RB
                        half = (jA4 // RB) & 1
                        A4I = jnp.zeros((RB + 1, K4), I32)
                        for r in range(RB):
                            q = jnp.sum(qv[r : r + 1, :1])  # scalar
                            A4I = A4I + (
                                (1 - jnp.minimum(jnp.abs(cmod - r), 1))
                                * (1 - jnp.minimum(
                                    jnp.abs(riA4 - (q + half)), 1)))
                        A4 = A4I.astype(BF16)
                        dnA = (((1,), (0,)), ((), ()))
                        acc = jax.lax.dot_general(
                            A4, R4, dnA,
                            preferred_element_type=jnp.float32
                        ).astype(I32).astype(U32)
                        if emit_idx:
                            # full-u32 idx plane: the same A4 routes its
                            # four 8-bit limbs as TWO stacked dots (limb
                            # pairs 1|0 and 3|2, odd limbs pre-scaled by
                            # 256 — per-lane pair sum <= 65535 < 2^24,
                            # f32-exact); recombined with a u32 multiply
                            # (vector left-shifts >= 16 miscompile).
                            Ri = i_scr[...]
                            R2i = jnp.concatenate(
                                [jnp.where(headm, Ri, U32(0)),
                                 jnp.where(headm, U32(0), Ri)], axis=0)

                            def _l8s(b):
                                return ((R2i >> U32(8 * b))
                                        & U32(255)).astype(I32)

                            R4a = jnp.concatenate(
                                [_l8s(1) * 256, _l8s(0)],
                                axis=0).astype(BF16)
                            R4b = jnp.concatenate(
                                [_l8s(3) * 256, _l8s(2)],
                                axis=0).astype(BF16)
                            dlo = jax.lax.dot_general(
                                A4, R4a, dnA,
                                preferred_element_type=jnp.float32
                            ).astype(I32).astype(U32)
                            dhi = jax.lax.dot_general(
                                A4, R4b, dnA,
                                preferred_element_type=jnp.float32
                            ).astype(I32).astype(U32)
                            acc_i = dhi * U32(1 << 16) + dlo
                        overlay_finish(acc, acc_i if emit_idx else None)
                        return
                    riA = jax.lax.broadcasted_iota(I32, (RB + 1, RB), 0)
                    jA = jax.lax.broadcasted_iota(I32, (RB + 1, RB), 1)
                    # One-hot routing matrices built with i32 arithmetic
                    # ONLY: boolean (i1) vectors on the sub-tile (9, 8)
                    # shape hit "Invalid relayout vector<9x8xi1>" in
                    # Mosaic (same family as the bool-concat pitfall), so
                    # eq(a,b) is computed as 1 - min(|a-b|, 1).
                    AhI = jnp.zeros((RB + 1, RB), I32)
                    AtI = jnp.zeros((RB + 1, RB), I32)
                    for r in range(RB):
                        q = jnp.sum(qv[r : r + 1, :1])    # scalar
                        col = 1 - jnp.minimum(jnp.abs(jA - r), 1)
                        AhI = AhI + col * (
                            1 - jnp.minimum(jnp.abs(riA - q), 1))
                        AtI = AtI + col * (
                            1 - jnp.minimum(jnp.abs(riA - (q + 1)), 1))
                    Ah = AhI.astype(BF16)
                    At = AtI.astype(BF16)
                    dnA = (((1,), (0,)), ((), ()))

                    def _limbs(x):
                        # Mosaic can't lower uint32 -> bf16 directly; the
                        # limbs are <= 256 so the i32 hop is exact.
                        return ((x >> U32(8)).astype(I32).astype(BF16),
                                (x & U32(255)).astype(I32).astype(BF16))

                    Rh_hi, Rh_lo = _limbs(Rh)
                    Rt_hi, Rt_lo = _limbs(Rt)
                    hi = (jax.lax.dot_general(
                              Ah, Rh_hi, dnA,
                              preferred_element_type=jnp.float32)
                          + jax.lax.dot_general(
                              At, Rt_hi, dnA,
                              preferred_element_type=jnp.float32))
                    lo = (jax.lax.dot_general(
                              Ah, Rh_lo, dnA,
                              preferred_element_type=jnp.float32)
                          + jax.lax.dot_general(
                              At, Rt_lo, dnA,
                              preferred_element_type=jnp.float32))
                    acc = (hi * jnp.float32(256) + lo).astype(I32).astype(U32)
                    if emit_idx:
                        # full-u32 idx plane rides the same one-hot
                        # routing as four 8-bit limbs (each dot places
                        # at most one nonzero term <= 255 per output
                        # lane, so f32 accumulation stays exact);
                        # recombined with multiplies, not shifts
                        if compact != "rowmxu2":
                            Ri = i_scr[...]
                        Rh_i = jnp.where(headm, Ri, U32(0))
                        Rt_i = jnp.where(headm, U32(0), Ri)

                        def _limb8(x, b):
                            return ((x >> U32(8 * b)) & U32(255)
                                    ).astype(I32).astype(BF16)

                        lim = []
                        for b in range(4):
                            db = (jax.lax.dot_general(
                                      Ah, _limb8(Rh_i, b), dnA,
                                      preferred_element_type=jnp.float32)
                                  + jax.lax.dot_general(
                                      At, _limb8(Rt_i, b), dnA,
                                      preferred_element_type=jnp.float32))
                            lim.append(db.astype(I32).astype(U32))
                        acc_i = (lim[3] * U32(1 << 24)
                                 + lim[2] * U32(1 << 16)
                                 + lim[1] * U32(1 << 8) + lim[0])
                else:
                    # idx plane: same routing, masked to the packed
                    # prefix (jw < rt) so untargeted lanes only ever
                    # accumulate zeros — full-u32 values, no encoding
                    enc_i = (jnp.where(jw < rt, xi, U32(0))
                             if emit_idx else None)
                    acc = jnp.zeros((RB + 1, C), U32)
                    acc_i = jnp.zeros((RB + 1, C), U32)
                    for r in range(RB):
                        o = jnp.sum(ro[r : r + 1, :1])           # scalar
                        q = o >> logC
                        cc = o - (q << logC)
                        rolled = pltpu.roll(enc[r : r + 1], cc, axis=1)
                        rowsel = q + (jP1 < cc).astype(I32)      # (1, C)
                        hit = riP == rowsel
                        acc = acc + jnp.where(hit, rolled, U32(0))
                        if emit_idx:
                            rolled_i = pltpu.roll(
                                enc_i[r : r + 1], cc, axis=1)
                            acc_i = acc_i + jnp.where(hit, rolled_i, U32(0))
                overlay_finish(acc, acc_i if emit_idx else None)
                return

            # ---- flat compact: prepend carried tail as row 0, global rank,
            # full-width butterfly. Row 0 holds the rem not-yet-tile-aligned
            # output elements; with keep=1 they get rank 1..rem and shift 0,
            # so the butterfly re-packs them at the front and the whole
            # result lands at W.
            # concat i32, not bool: i1 vectors don't concatenate on Mosaic
            keep_all = jnp.concatenate([keep_t.astype(I32), keep.astype(I32)], axis=0) != 0
            rank = _flat_cumsum(keep_all.astype(I32), RB + 1, C)
            if ablate == "rank":
                _ablate_out(rank)
                return
            # rank is non-decreasing in flat order: its last element is the
            # total — a (1,1) slice-reduce instead of a full-plane max
            total_new = W + jnp.sum(rank[RB:, C - 1 :])
            jf = jax.lax.broadcasted_iota(I32, (RB + 1, C), 1)
            rf = jax.lax.broadcasted_iota(I32, (RB + 1, C), 0)
            flat_i = rf * C + jf
            shift = jnp.where(keep_all, flat_i - (rank - 1), 0)

            # Single-plane packed compaction whenever block-local values
            # (< BC + l) and shifts (< BCP) both fit 16 bits (C <= 4096 at
            # RB = 8): ~2x cheaper than the generic two-plane butterfly.
            # The carried tail can hold arbitrary u32s, so it does not ride
            # the packed plane — its slots still count in rank (real
            # elements land from position rem on) and are overlaid after.
            packed_compact = (not emit_idx) and BC + 8192 <= (1 << 16) \
                and BCP <= (1 << 16)
            if packed_compact:
                assert l < 8192
                base_off = jnp.int32(base).astype(U32) + off
                local = jnp.concatenate(
                    [jnp.zeros((1, C), U32), vals0 - base_off], axis=0)
                keep_real = keep_all & (rf > 0)
                xplane = jnp.where(
                    keep_real,
                    (local & U32(0xFFFF)) | (shift.astype(U32) * U32(1 << 16)),
                    U32(0xFFFF))
                xout = _butterfly_packed(xplane, C, BCP)
                vals_g = (xout & U32(0xFFFF)) + base_off
                trow = tailbuf[:].reshape(1, TAIL)
                if C > TAIL:
                    trow = jnp.concatenate(
                        [trow, jnp.full((1, C - TAIL), INVALID, U32)], axis=1)
                row0 = jnp.where(jt < rem, trow, vals_g[:1])
                packed = [jnp.concatenate([row0, vals_g[1:]], axis=0)]
            else:
                def plane(tail, vals):
                    trow = tail[:].reshape(1, TAIL)
                    if C > TAIL:
                        trow = jnp.concatenate(
                            [trow, jnp.full((1, C - TAIL), INVALID, U32)], axis=1
                        )
                    full = jnp.concatenate([trow, vals], axis=0)
                    return jnp.where(keep_all, full, INVALID)

                planes = [plane(tailbuf, vals0)]
                if emit_idx:
                    planes.append(plane(tailbuf2, gw))
                packed = _butterfly(planes, shift, C)

            finish(packed, total_new)

        @pl.when(active)
        def _():
            body()

        # count is read by the host after the last block; state[0] holds the
        # running total (or the ablate checksum) either way.
        count_ref[0] = state[0]

    return kernel, SLAB, BC, SP


def _invoke_pallas(codes, ambiguous, nw, table, mul_const,
                   *, k, w, mode, skip_ambiguous, hasher_key, C, G,
                   interpret=False, packed_input=None, input_mode=None,
                   fold_ascii=False, ablate=None, out_cap=None,
                   compact=None):
    """Raw pallas_call invocation (composable inside shard_map/jit).

    input_mode: "striped2" (2-bit DNA words), "striped8" (raw ASCII bytes,
    4/word — general text, or DNA folded on device with fold_ascii), or
    "i32" (one char per int32). `packed_input` is the legacy bool alias
    for striped2-vs-i32.
    """
    if input_mode is None:
        input_mode = "striped2" if packed_input else "i32"
    compact = compact or DEF_COMPACT
    kind, canonical, rot_offset = hasher_key
    l = k + w - 1
    PADH = max(128, -(-(l - 1) // 128) * 128)
    kernel, SLAB, BC, SP = _make_kernel(
        k, w, mode, skip_ambiguous, kind, canonical, rot_offset, C, G, PADH,
        in_mode=input_mode, fold_ascii=fold_ascii, ablate=ablate,
        out_cap=out_cap, compact=compact,
    )
    BCP = (RB + 1) * C
    cap = G * BC + BCP + TAIL
    if out_cap is not None:
        # reduced buffer for huge low-density runs; kernel clamps appends
        # so an overflow truncates (count still reports the true total)
        assert out_cap % TAIL == 0 and out_cap >= BCP + TAIL
        cap = min(cap, out_cap)
    emit_idx = mode == MODE_SUPERKMERS

    def _slab_scratch(im, C, SLAB):
        if im == "striped2":
            return pltpu.VMEM((striped_geometry(C)[2],), jnp.uint32)
        if im == "striped2r":
            return pltpu.VMEM((RB, rowstriped_geometry(C, PADH)[2]), jnp.uint32)
        if im == "striped8":
            return pltpu.VMEM((striped8_geometry(C)[2],), jnp.uint32)
        return pltpu.VMEM((SLAB,), jnp.int32)

    # Per-block any-ambiguity flags, prefetched to SMEM so the kernel can
    # gate the ambiguity plane's DMA + decode + fold per block (clean
    # blocks — the common real-genome shape, where Ns cluster — skip all
    # of it). Block slabs INCLUDE the halo in every wire format (the
    # row-striped rows span C + PADH chars; the flat slabs carry the TAIL
    # pad), so a halo-only N still flags its block. Sized G + 1 with a
    # trailing 0: the kernel probes g + 1 for the prefetch schedule.
    if skip_ambiguous:
        if input_mode == "striped2r":
            blocks = ambiguous[: G * RB].reshape(G, -1)
        elif input_mode == "striped2":
            Wp = striped_geometry(C)[2]
            blocks = ambiguous[: G * Wp].reshape(G, Wp)
        elif input_mode == "striped8":
            Wp = striped8_geometry(C)[2]
            blocks = ambiguous[: G * Wp].reshape(G, Wp)
        else:
            blocks = None  # i32 slabs overlap; decode every block
        if blocks is None:
            amb_any = jnp.ones((G + 1,), jnp.int32)
        else:
            amb_any = jnp.concatenate([
                jnp.any(blocks != 0, axis=1).astype(jnp.int32),
                jnp.zeros((1,), jnp.int32),
            ])
    else:
        amb_any = jnp.zeros((2,), jnp.int32)
    MXE = (jnp.float32 if compact == "rowf32"
           else jnp.int8 if compact == "rowmxu4" else jnp.bfloat16)
    NCHS = C // (32 if compact == "rowmxu4" else 128)
    out_shapes = (
        jax.ShapeDtypeStruct((cap,), jnp.uint32),
        jax.ShapeDtypeStruct((cap if emit_idx else TAIL,), jnp.uint32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # nw, table, mul_const, amb_any
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # codes (G+1, BC)
            pl.BlockSpec(memory_space=pl.ANY),  # ambiguous (G+1, BC)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # out positions
            pl.BlockSpec(memory_space=pl.ANY),  # superkmer idx
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count
        ),
        scratch_shapes=[
            _slab_scratch(input_mode, C, SLAB),
            _slab_scratch(input_mode, C, SLAB),
            # double-buffered ambiguity slabs (tiny dummies when the mode
            # doesn't read them)
            (_slab_scratch(input_mode, C, SLAB) if skip_ambiguous
             else pltpu.VMEM((8,), jnp.uint32)),
            (_slab_scratch(input_mode, C, SLAB) if skip_ambiguous
             else pltpu.VMEM((8,), jnp.uint32)),
            pltpu.VMEM((BCP,), jnp.uint32),
            pltpu.VMEM((BCP,), jnp.uint32),
            pltpu.VMEM((TAIL,), jnp.uint32),
            pltpu.VMEM((TAIL,), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
        ] + ([
            # grid-invariant one-hot rank matrices, filled once at g==0
            pltpu.VMEM((C, NCHS), MXE),
            pltpu.VMEM((NCHS, C), MXE),
        ] if _rowplace_enabled(compact, C, l) else []) + ([
            # rolled-row staging plane(s) for the MXU paint variants
            # (a second one for the super-k-mer index plane); the
            # rowmxu2 log-stage staging stays in registers and needs none
            pltpu.VMEM((RB, C), jnp.uint32),
        ] * (2 if mode == MODE_SUPERKMERS else 1)
          if _mxu_paint_enabled(mode, compact, C, l)
          and compact != "rowmxu2" else []) + ([
            # per-block skip mask filled by both gate branches
            pltpu.VMEM((RB, C), jnp.int32),
        ] if skip_ambiguous else []) + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, idx, count = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(nw, table, mul_const, amb_any, codes, ambiguous)
    return out, idx, count


_fused_call = jax.jit(
    _invoke_pallas,
    static_argnames=("k", "w", "mode", "skip_ambiguous", "hasher_key", "C", "G",
                     "interpret", "packed_input", "input_mode", "fold_ascii",
                     "ablate", "out_cap", "compact"),
)


def padh_for(l: int) -> int:
    return max(128, -(-(l - 1) // 128) * 128)


def rowstriped_need_chars(G: int, C: int, PADH: int) -> int:
    """Input chars the row-striped packer reads for a G-block call."""
    from .. import native

    _, SPW, _ = rowstriped_geometry(C, PADH)
    return native.rowstriped_need_chars_raw(G, RB * C, C, SPW)


def pack_rowstriped(codes_padded: np.ndarray, G: int, C: int, PADH: int) -> np.ndarray:
    """Host-side row-striped packing for a G-block fused call."""
    from .. import native

    SP, SPW, SPW_PAD = rowstriped_geometry(C, PADH)
    assert codes_padded.size >= rowstriped_need_chars(G, C, PADH)
    w = native.pack_2bit_rowstriped(codes_padded, G, RB * C, C, SP, SPW, SPW_PAD)
    return w.reshape(G * RB, SPW_PAD)


def _fused_launch(
    codes_np: np.ndarray,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = MODE_MINIMIZERS,
    ambiguous_np: np.ndarray | None = None,
    C: int | None = None,
    interpret: bool = False,
    G: int | None = None,
    offset: int = 0,
    dna: bool | None = None,
    compact: str | None = None,
):
    """Pack + transfer + enqueue one fused call WITHOUT synchronizing.

    Returns device handles (out, idx, count) or None for an empty input.
    JAX dispatch is async, so the caller can keep packing/launching the
    next span on the host while this one computes — the overlap engine
    behind sketch_long's streaming.
    """
    C = C or DEF_C
    l = k + w - 1
    n = int(codes_np.shape[0])
    assert n < (1 << 31), "fused kernel handles < 2^31 chars per call (see sketch_long)"
    assert C >= TAIL, f"fused kernel needs C >= {TAIL}"
    if n < l:
        return None
    nw = n - l + 1
    BC = RB * C
    G = max(G or 1, -(-nw // BC))
    # DNA codes ship 2-bit row-striped (0.375 B/bp incl. halo duplication,
    # fully (RB, lane)-shaped on-device decode); general ASCII text
    # (&[u8], values > 3) ships byte-striped (1 B/bp). Both are decoded to
    # the lane matrix in VMEM via tile-repeat + shift (plain u8 HBM
    # slices don't tile-align for the DMA engine).
    from .. import native
    from ..utils.bits import probe_is_dna

    is_2bit = probe_is_dna(codes_np) if dna is None else dna
    skip_ambiguous = ambiguous_np is not None
    if is_2bit:
        input_mode = "striped2r"
        PADH = padh_for(l)
        need = max(G * BC + TAIL, rowstriped_need_chars(G, C, PADH))

        def pack(buf):
            return pack_rowstriped(buf, G, C, PADH)
    else:
        input_mode = "striped8"
        _, SLABW, SLABW_PAD = striped8_geometry(C)
        need = G * BC + TAIL

        def pack(buf):
            return native.pack_bytes_striped(buf, G, BC, SLABW, SLABW_PAD)
    codes = np.zeros(need, np.uint8)
    codes[:n] = codes_np
    codes_dev = jnp.asarray(pack(codes))
    if skip_ambiguous:
        amb = np.zeros(need, np.uint8)
        amb[:n] = ambiguous_np
        amb_dev = jnp.asarray(pack(amb))
    else:
        amb_dev = jnp.zeros(TAIL, jnp.uint32)
    key, table, mul_const = hasher_jit_args(hasher)
    off_bits = np.asarray([np.uint32(offset)], np.uint32).view(np.int32)[0]
    return _fused_call(
        codes_dev, amb_dev, jnp.asarray([nw, off_bits], np.int32),
        jnp.asarray(table), jnp.asarray([mul_const], np.uint32),
        k=k, w=w, mode=mode, skip_ambiguous=skip_ambiguous, hasher_key=key,
        C=C, G=G, interpret=interpret, input_mode=input_mode,
        compact=compact,
    )


def _fused_harvest(handles, mode: str, cnt: int | None = None):
    """Materialize one launch's results on host (the only sync point).

    `cnt` short-circuits the count fetch when the caller already knows it
    (sketch_records fetches every wave's counts in ONE stacked transfer —
    half the tunnel round trips of count-then-data per record)."""
    empty = np.zeros(0, dtype=np.uint32)
    if handles is None:
        return (empty, empty) if mode == MODE_SUPERKMERS else empty
    out, idx, count = handles
    if cnt is None:
        cnt = int(count[0])
    if mode == MODE_SUPERKMERS:
        # slice on device first: only cnt elements cross host<->device
        return np.asarray(out[:max(cnt, 1)][:cnt]), np.asarray(idx[:max(cnt, 1)][:cnt])
    return np.asarray(out[:max(cnt, 1)][:cnt])


def fused_sketch(
    codes_np: np.ndarray,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = MODE_MINIMIZERS,
    ambiguous_np: np.ndarray | None = None,
    C: int | None = None,
    interpret: bool = False,
    G: int | None = None,
    offset: int = 0,
    dna: bool | None = None,
    compact: str | None = None,
):
    """Whole-sequence sketch through the fused kernel (host convenience).

    Returns positions (np.uint32), or (positions, superkmer indices).
    `G` may over-provision the grid (excess blocks are fully masked), which
    lets callers bucket grid sizes to bound recompiles. `offset` shifts all
    emitted positions/window indices (u32), for >2^31-char streaming
    (sketch_long) and sharding. `dna` selects the 2-bit wire format without
    scanning the input (True: values are 2-bit codes; False: general text
    bytes); None falls back to an O(n) host probe.
    """
    return _fused_harvest(
        _fused_launch(codes_np, k, w, hasher, mode=mode,
                      ambiguous_np=ambiguous_np, C=C, interpret=interpret,
                      G=G, offset=offset, dna=dna, compact=compact),
        mode,
    )


class _LaunchWave:
    """Device-memory-bounded asynchronous launch queue with stacked-count
    harvest.

    Launches are enqueued without synchronizing (host pack of the next
    span overlaps device compute); a wave is harvested with ONE stacked
    count fetch plus one streaming data fetch per launch — 1 + N round
    trips instead of the 2N a per-launch count-then-data sync pays, and
    uploads never run concurrently with result fetches (two interleaved
    large streams over a high-latency link lose throughput; measured
    round 4, bench/onchip_r4_results.json records rows).
    SMTPU_RECORDS_WAVE_BYTES bounds in-flight device memory (default
    4 GiB); the 128-launch cap bounds the stacked-count concat program.
    """

    def __init__(self, mode: str, sink):
        self.mode = mode
        self.sink = sink  # sink(key, harvested result)
        self.wave = []  # (key, launch handles)
        self.bytes = 0
        self.budget = int(os.environ.get("SMTPU_RECORDS_WAVE_BYTES",
                                         4 << 30))

    @staticmethod
    def launch_footprint(G: int, C: int, mode: str) -> int:
        cap = G * RB * C + (RB + 1) * C + TAIL
        out_b = 4 * cap * (2 if mode == MODE_SUPERKMERS else 1)
        return out_b + 2 * G * RB * C  # outputs + packed input(+amb) slack

    def add(self, key, handles, footprint: int):
        # flush BEFORE launching more so in-flight memory stays bounded
        if self.wave and (self.bytes + footprint > self.budget
                          or len(self.wave) >= 128):
            self.flush()
        self.wave.append((key, handles))
        self.bytes += footprint

    def flush(self):
        if not self.wave:
            return
        cnts = np.asarray(jnp.concatenate([hnd[2] for _, hnd in self.wave]))
        for (key, hnd), cnt in zip(self.wave, cnts):
            self.sink(key, _fused_harvest(hnd, self.mode, cnt=int(cnt)))
        self.wave.clear()
        self.bytes = 0


def long_span_grid(n: int, l: int, span_chars: int, C: int | None = None) -> int:
    """Pow2-bucketed G that serves EVERY span of a sketch_long stream
    (incl. the smaller last one): a single Mosaic compile for the whole
    stream. Shared with bench/paper.py's serial A/B so both sides run
    the identical program."""
    C = C or DEF_C
    span_nw = min(span_chars - (l - 1), n - l + 1)
    Gs = -(-span_nw // (RB * C))
    return 1 << (Gs - 1).bit_length() if Gs > 1 else 1


def sketch_long(
    codes_np: np.ndarray,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = MODE_MINIMIZERS,
    ambiguous_np: np.ndarray | None = None,
    C: int | None = None,
    span_chars: int = 1 << 29,
    interpret: bool = False,
    dna: bool | None = None,
    wave_budget: int = 0,
):
    """Stream a sequence of up to 2^32 chars through span-sized fused calls.

    Spans overlap by l-1 chars so every window is owned by one span;
    positions come out sequence-global via the kernel's u32 offset, and
    spans merge with seam dedup (the multi-shard scheme of
    parallel/multihost.py applied to one device). Mirrors the reference's
    "split inputs over 4 GB chars" guidance (src/sliding_min.rs:96-99).

    Schedule: EAGER waves by default (wave_budget=0: harvest the
    previous span BEFORE packing/launching the next), so transfers stay
    strictly serialized on high-latency links; raise wave_budget to
    enqueue spans asynchronously like sketch_records does. Measured
    round 4 (bench/onchip_r4_results.json wave_diag/wave_diag2): the
    eager schedule matches a hand-written serial launch/harvest loop
    (5.7 vs 5.1-5.6 s over 200 Mbp in 3 spans, tunnel weather +-30%);
    sketch_long's remaining overhead vs that loop is the host seam-merge
    concatenation of the final positions array (~2.5 s for 133 MB on
    this ~100 MB/s-memory host; microseconds-per-MB on a normal one).
    """
    l = k + w - 1
    n = int(codes_np.shape[0])
    assert n < (1 << 32), "positions are u32: 2^32 chars max per sequence"
    empty = np.zeros(0, dtype=np.uint32)
    if n < l:
        return (empty, empty) if mode == MODE_SUPERKMERS else empty
    if n <= span_chars:
        return fused_sketch(codes_np, k, w, hasher, mode=mode,
                            ambiguous_np=ambiguous_np, C=C, interpret=interpret,
                            dna=dna)
    nw = n - l + 1
    C = C or DEF_C
    Gs = long_span_grid(n, l, span_chars, C)
    spans = []
    idxs = []
    starts = []

    def sink(_key, res):
        if mode == MODE_SUPERKMERS:
            spans.append(res[0])
            idxs.append(res[1])
        else:
            spans.append(res)

    wave = _LaunchWave(mode, sink)
    wave.budget = wave_budget  # 0 = eager (harvest before the next launch)
    fp = _LaunchWave.launch_footprint(Gs, C, mode)
    s = 0
    while s < nw:
        starts.append(s)
        e = min(s + span_chars - (l - 1), nw)
        chars_end = min(e - 1 + l, n)
        amb = ambiguous_np[s:chars_end] if ambiguous_np is not None else None
        # flush BEFORE packing/enqueuing the next span: launching first
        # would stream span i+1's upload concurrently with span i's
        # result fetch, the interleaved-transfer pathology measured at
        # 0.25-0.95x serial in rounds 3-4
        if wave.wave and (wave.bytes + fp > wave.budget
                          or len(wave.wave) >= 128):
            wave.flush()
        wave.add(s, _fused_launch(codes_np[s:chars_end], k, w, hasher,
                                  mode=mode, ambiguous_np=amb, C=C, offset=s,
                                  interpret=interpret, G=Gs, dna=dna), fp)
        s = e
    wave.flush()
    if mode in (MODE_CLOSED_SYNCMERS, MODE_OPEN_SYNCMERS):
        return np.concatenate(spans)  # window indices never repeat across spans
    from ..parallel.multihost import merge_adjacent_shards

    if mode == MODE_SUPERKMERS:
        return merge_adjacent_shards(spans, starts, codes_np, k, w, hasher,
                                     ambiguous_np, aux=idxs)
    return merge_adjacent_shards(spans, starts, codes_np, k, w, hasher,
                                 ambiguous_np)


def sketch_records(
    records,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = MODE_MINIMIZERS,
    ambiguous=None,
    C: int | None = None,
    span_chars: int = 1 << 29,
    interpret: bool = False,
    dna: bool | None = None,
):
    """Sketch many independent sequences with a wave launch schedule.

    The analog of the reference bench's rayon par_iter over chromosomes
    (/root/reference/bench/src/bin/paper.rs:442-459) for a single device:
    records are decomposed into spans exactly like sketch_long, then ALL
    spans are launched asynchronously (in device-memory-bounded waves) so
    host pack of span j+1 overlaps device compute of span j, and a wave's
    results are harvested with ONE stacked count fetch + one streaming
    data fetch per span (1 + spans round trips instead of the 2*spans a
    per-record sync pays). Per-record results are bit-identical to
    fused_sketch/sketch_long on each record alone; positions are
    record-local. SMTPU_RECORDS_WAVE_BYTES bounds in-flight device memory
    (default 4 GiB).

    `ambiguous` is an optional per-record list (None entries allowed).
    Returns a list: positions, or (positions, superkmer indices) per
    record (empty for records shorter than one window).
    """
    l = k + w - 1
    C = C or DEF_C
    nrec = len(records)
    ambiguous = list(ambiguous) if ambiguous is not None else [None] * nrec
    assert len(ambiguous) == nrec, "ambiguous must align with records"
    from .pipeline import assert_no_superkmer_ambiguity

    assert_no_superkmer_ambiguity(
        mode, any(a is not None for a in ambiguous))
    rec_spans = [[] for _ in range(nrec)]
    rec_idxs = [[] for _ in range(nrec)]
    rec_starts = [[] for _ in range(nrec)]

    def sink(ri, res):
        if mode == MODE_SUPERKMERS:
            rec_spans[ri].append(res[0])
            rec_idxs[ri].append(res[1])
        else:
            rec_spans[ri].append(res)

    wave = _LaunchWave(mode, sink)
    for ri, codes_np in enumerate(records):
        n = int(codes_np.shape[0])
        assert n < (1 << 32), "positions are u32: 2^32 chars max per record"
        if n < l:
            continue
        nw = n - l + 1
        # pow2-bucketed per record (== the single-sequence grid choice),
        # so same-magnitude records share one compiled program
        Gs = long_span_grid(n, l, span_chars, C)
        fp = _LaunchWave.launch_footprint(Gs, C, mode)
        amb = ambiguous[ri]
        s = 0
        while s < nw:
            rec_starts[ri].append(s)
            e = min(s + span_chars - (l - 1), nw)
            chars_end = min(e - 1 + l, n)
            a = amb[s:chars_end] if amb is not None else None
            wave.add(ri, _fused_launch(codes_np[s:chars_end], k, w, hasher,
                                       mode=mode, ambiguous_np=a, C=C,
                                       offset=s, interpret=interpret, G=Gs,
                                       dna=dna), fp)
            s = e
    wave.flush()

    from ..parallel.multihost import merge_adjacent_shards

    empty = np.zeros(0, dtype=np.uint32)
    out = []
    for ri, codes_np in enumerate(records):
        spans_r = rec_spans[ri]
        if not spans_r:
            out.append((empty, empty) if mode == MODE_SUPERKMERS else empty)
        elif mode in (MODE_CLOSED_SYNCMERS, MODE_OPEN_SYNCMERS):
            out.append(np.concatenate(spans_r))
        elif len(spans_r) == 1:
            out.append((spans_r[0], rec_idxs[ri][0])
                       if mode == MODE_SUPERKMERS else spans_r[0])
        elif mode == MODE_SUPERKMERS:
            out.append(merge_adjacent_shards(
                spans_r, rec_starts[ri], codes_np, k, w, hasher,
                ambiguous[ri], aux=rec_idxs[ri]))
        else:
            out.append(merge_adjacent_shards(
                spans_r, rec_starts[ri], codes_np, k, w, hasher,
                ambiguous[ri]))
    return out
