"""TPU-native array pipeline (pure jnp / XLA).

This is the data-parallel reformulation of the reference's sequential
streaming design (SURVEY.md §7). Instead of a rolling hash + two-stacks
ring buffer per SIMD lane, everything becomes whole-array ops the XLA
TPU compiler can fuse and tile onto the VPU:

- rolling ntHash       -> windowed XOR of per-position rotated table values,
                          computed from one prefix-XOR scan; the rolling
                          recurrence h' = rotl(h,1) ^ ... (reference
                          bench/src/nthash.rs:90) distributes over XOR, so
                          h[i] = rotr( X[i+k] ^ X[i], i ) with
                          X = exclusive-prefix-xor of u[p] = rotl(T[s[p]], p+off).
- two-stacks sliding min -> block prefix/suffix minima: reshape the key
                          stream to (blocks, w), cummin left and right, and
                          combine  win[i] = min(suffix[i], prefix[i+w-1])
                          (the parallel form of reference
                          src/sliding_min.rs:269-284).
- 16-bit position trick -> full lexicographic (hash_top16, position) pairs.
                          The reference packs positions into the low 16 bits
                          purely to save SIMD registers and must re-base them
                          periodically (src/sliding_min.rs:245-252); on the
                          TPU VPU we keep a second u32 plane instead, which
                          is wrap-free at any length while ordering
                          identically.
- canonical strand      -> windowed #TG counts from one prefix sum
                          (reference src/canonical.rs:12-31).
- dedup + compaction    -> keep-mask + cumsum + scatter into a
                          capacity-bounded buffer with a count (the
                          shuffle-LUT compaction of
                          src/intrinsics/dedup.rs done the XLA way).

All comparisons use only the top 16 bits of the hash with
leftmost/rightmost tie-breaking, bit-identically to the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..hashers import KmerHasher
from ..utils.bits import SKIPPED as _SKIPPED_NP

U32 = jnp.uint32
TOP16 = jnp.uint32(0xFFFF_0000)
INVALID = jnp.uint32(0xFFFF_FFFF)
SKIPPED = jnp.uint32(int(_SKIPPED_NP))


def _rotl(x: jnp.ndarray, r) -> jnp.ndarray:
    """Rotate-left uint32 by r (scalar int or uint32 array, 0..31)."""
    if isinstance(r, int):
        r %= 32
        if r == 0:
            return x
        return (x << U32(r)) | (x >> U32(32 - r))
    r = r.astype(U32) % U32(32)
    left = x << r
    right = jnp.where(r == 0, U32(0), x >> (U32(32) - r))
    return left | right


def _prefix_xor_exclusive(u: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix-xor scan: P[0] = 0, P[i] = u[0]^...^u[i-1]."""
    inc = jax.lax.associative_scan(jnp.bitwise_xor, u)
    return jnp.concatenate([jnp.zeros(1, dtype=u.dtype), inc])


def _position_rotations(n: int, offset: jnp.ndarray | int) -> jnp.ndarray:
    """(p + offset) mod 32 for p in 0..n-1, as uint32."""
    p = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    return (p.astype(U32) + jnp.asarray(offset, U32)) % U32(32)


def nt_like_kmer_hashes(
    vals: jnp.ndarray, k: int, rot_offset: int, canonical: bool, comp_vals: jnp.ndarray | None
) -> jnp.ndarray:
    """XOR-rolling kmer hashes from per-position table values.

    h_fwd[i] = XOR_{j<k} rotl32(vals[i+j], (j + rot_offset) % 32)
    h_rc[i]  = XOR_{j<k} rotl32(comp_vals[i+k-1-j], (j + rot_offset) % 32)
    returns h_fwd (^ h_rc when canonical), uint32[n-k+1].
    """
    n = vals.shape[0]
    nk = n - k + 1
    i_rot = _position_rotations(nk, 0)

    # forward: u[p] = rotl(vals[p], p + rot_offset); X windowed-xor; rotr by i.
    u = _rotl(vals, _position_rotations(n, rot_offset))
    P = _prefix_xor_exclusive(u)
    X = P[k:] ^ P[:-k]  # length nk
    h = _rotl(X, U32(32) - i_rot)  # rotr by i

    if canonical:
        assert comp_vals is not None
        # rc: amount for char at abs pos p within kmer i is (i+k-1-p)+off
        #   = ((k-1+off - p) + i); factor the p part into ur, then rotl by i.
        p_mod = _position_rotations(n, 0)
        ur = _rotl(comp_vals, (jnp.asarray(k - 1 + rot_offset, U32) - p_mod) % U32(32))
        Pr = _prefix_xor_exclusive(ur)
        Xr = Pr[k:] ^ Pr[:-k]
        r = _rotl(Xr, i_rot)
        h = h ^ r
    return h


def antilex_kmer_hashes(codes: jnp.ndarray, k: int, canonical: bool) -> jnp.ndarray:
    """~(first min(k,16) chars packed MSB-first); canonical = fwd ^ rc."""
    n = codes.shape[0]
    nk = n - k + 1
    c = (codes & U32(3)).astype(U32)
    la = jnp.zeros(nk, dtype=U32)
    for j in range(min(k, 16)):
        la = la | (c[j : j + nk] << U32(30 - 2 * j))
    h = ~la
    if canonical:
        cc = c ^ U32(2)
        ra = jnp.zeros(nk, dtype=U32)
        # rc kmer char j = comp(code[i + k-1-j])
        for j in range(min(k, 16)):
            ra = ra | (cc[k - 1 - j : k - 1 - j + nk] << U32(30 - 2 * j))
        h = h ^ (~ra)
    return h


def kmer_hashes(codes: jnp.ndarray, hasher: KmerHasher) -> jnp.ndarray:
    """uint32 hashes of all kmers; dispatches on hasher kind."""
    k = hasher.k
    if hasher.kind == "antilex":
        return antilex_kmer_hashes(codes, k, hasher.canonical)
    if hasher.kind == "nt":
        table = jnp.asarray(hasher.table, dtype=U32)
        c = (codes & U32(3)).astype(jnp.int32)
        vals = jnp.take(table, c)
        comp_vals = jnp.take(table, c ^ 2) if hasher.canonical else None
        return nt_like_kmer_hashes(vals, k, hasher.rot_offset, hasher.canonical, comp_vals)
    if hasher.kind == "mul":
        mc = jnp.asarray(hasher.mul_const, dtype=U32)
        cu = codes.astype(U32)
        vals = (cu + U32(1)) * mc
        comp_vals = ((cu ^ U32(2)) + U32(1)) * mc if hasher.canonical else None
        return nt_like_kmer_hashes(vals, k, hasher.rot_offset, hasher.canonical, comp_vals)
    raise ValueError(f"unknown hasher kind {hasher.kind}")


def _lex_combine(make_right_tie: bool):
    """Associative combine for (hash, pos) pairs: min hash, tie -> min pos
    (leftmost) or max pos (rightmost)."""

    def combine(a, b):
        ah, ap = a
        bh, bp = b
        if make_right_tie:
            better = (bh < ah) | ((bh == ah) & (bp > ap))
        else:
            better = (bh < ah) | ((bh == ah) & (bp < ap))
        return jnp.where(better, bh, ah), jnp.where(better, bp, ap)

    return combine


def window_lr_min(hv: jnp.ndarray, w: int, want_right: bool) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Sliding-window minima over (top-16 hash, position) with exact ties.

    hv: uint32[nk] (already masked to the top 16 bits; padding = 0xffffffff).
    Returns (lpos, rpos) uint32[nk - w + 1]; rpos is None unless want_right.

    Block prefix/suffix formulation: with keys reshaped to rows of length w,
    win[i] = lexmin(suffix_min_flat[i], prefix_min_flat[i + w - 1]).
    """
    nk = hv.shape[0]
    nw = nk - w + 1
    assert nw >= 1
    pos = jax.lax.broadcasted_iota(jnp.int32, (nk, 1), 0)[:, 0].astype(U32)

    nrows = -(-nk // w) + 1  # one extra row so i + w - 1 always lands in-bounds
    pad = nrows * w - nk
    hp = jnp.concatenate([hv, jnp.full(pad, INVALID, U32)]).reshape(nrows, w)
    pp = jnp.concatenate([pos, jnp.full(pad, INVALID, U32)]).reshape(nrows, w)

    def scans(right_tie: bool):
        comb = _lex_combine(right_tie)
        sh, sp = jax.lax.associative_scan(comb, (hp, pp), axis=1, reverse=True)
        ph, ppx = jax.lax.associative_scan(comb, (hp, pp), axis=1)
        # win[i] = comb(suffix_flat[i], prefix_flat[i + w - 1])
        s = (sh.reshape(-1)[:nw], sp.reshape(-1)[:nw])
        p = (ph.reshape(-1)[w - 1 : w - 1 + nw], ppx.reshape(-1)[w - 1 : w - 1 + nw])
        _, wpos = comb(s, p)
        return wpos

    lpos = scans(False)
    rpos = scans(True) if want_right else None
    return lpos, rpos


def windowed_sum_flags(bits: jnp.ndarray, l: int) -> jnp.ndarray:
    """Windowed sums of 0/1 bits over length-l windows, int32[n - l + 1]."""
    cs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(bits.astype(jnp.int32))])
    return cs[l:] - cs[:-l]


def compact(values: jnp.ndarray, keep: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stream compaction: gather kept values to the front of a same-size
    buffer (tail = INVALID), plus the kept count."""
    n = values.shape[0]
    idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    count = idx[-1] + 1 if n else jnp.int32(0)
    tgt = jnp.where(keep, idx, n)  # out-of-range drops
    out = jnp.full(n, INVALID, U32).at[tgt].set(values, mode="drop")
    return out, count.astype(jnp.int32)


# ----------------------------------------------------------------------------
# Full pipelines (jitted per (padded length, k, w, mode) signature)
# ----------------------------------------------------------------------------

MODE_MINIMIZERS = "minimizers"
MODE_SUPERKMERS = "superkmers"
MODE_CLOSED_SYNCMERS = "closed_syncmers"
MODE_OPEN_SYNCMERS = "open_syncmers"


def selected_window_stream(codes, n, k, w, hasher, ambiguous=None):
    """Per-window selected minimizer positions (uint32[nw_padded]) + validity.

    codes: uint8[N] padded; n: true length (traced scalar). Invalid windows
    get INVALID; ambiguous windows get SKIPPED.
    """
    N = codes.shape[0]
    l = k + w - 1
    nk = N - k + 1
    nw = N - l + 1
    h = kmer_hashes(codes, hasher)
    hv = h & TOP16
    kidx = jax.lax.broadcasted_iota(jnp.int32, (nk, 1), 0)[:, 0]
    hv = jnp.where(kidx <= n - k, hv, INVALID)
    lpos, rpos = window_lr_min(hv, w, want_right=hasher.canonical)
    if hasher.canonical:
        tg = (codes.astype(jnp.int32) >> 1) & 1
        cnt = windowed_sum_flags(tg, l)
        sel = jnp.where(2 * cnt > l, lpos, rpos)
    else:
        sel = lpos
    widx = jax.lax.broadcasted_iota(jnp.int32, (nw, 1), 0)[:, 0]
    valid = widx <= n - l
    if ambiguous is not None:
        ambi = windowed_sum_flags(ambiguous, l) > 0
        sel = jnp.where(ambi, SKIPPED, sel)
    sel = jnp.where(valid, sel, INVALID)
    return sel, valid, widx


def _pipeline(codes, n, k, w, hasher, mode, skip_ambiguous, ambiguous):
    sel, valid, widx = selected_window_stream(
        codes, n, k, w, hasher, ambiguous if skip_ambiguous else None
    )
    if mode in (MODE_CLOSED_SYNCMERS, MODE_OPEN_SYNCMERS):
        ju = widx.astype(U32)
        if mode == MODE_OPEN_SYNCMERS:
            is_sync = sel == ju + U32(w // 2)
        else:
            is_sync = (sel == ju) | (sel == ju + U32(w - 1))
        keep = valid & is_sync & (sel != SKIPPED)
        out, count = compact(ju, keep)
        return out, count
    # minimizers / superkmers: dedup against the raw previous window value
    prev = jnp.concatenate([jnp.full(1, INVALID, U32), sel[:-1]])
    keep = valid & (sel != prev)
    if skip_ambiguous:
        keep = keep & (sel != SKIPPED)
    if mode == MODE_SUPERKMERS:
        out, count = compact(sel, keep)
        idx, _ = compact(widx.astype(U32), keep)
        return out, idx, count
    out, count = compact(sel, keep)
    return out, count


@functools.partial(
    jax.jit, static_argnames=("k", "w", "mode", "skip_ambiguous", "hasher_key")
)
def _jit_pipeline(codes, n, ambiguous, table, mul_const, *, k, w, mode, skip_ambiguous, hasher_key):
    """Jit entry: hasher reconstructed from its static key + traced params."""
    kind, canonical, rot_offset = hasher_key
    hasher = _TracedHasher(kind, k, canonical, rot_offset, table, mul_const)
    return _pipeline(codes, n, k, w, hasher, mode, skip_ambiguous, ambiguous)


class _TracedHasher:
    """Hasher view whose table/const are traced arrays (jit-friendly)."""

    def __init__(self, kind, k, canonical, rot_offset, table, mul_const):
        self.kind = kind
        self.k = k
        self.canonical = canonical
        self.rot_offset = rot_offset
        self.table = table
        self.mul_const = mul_const


def hasher_jit_args(hasher: KmerHasher):
    """(static key, traced table, traced mul const) for a host hasher."""
    key = (hasher.kind, hasher.canonical, getattr(hasher, "rot_offset", 0))
    table = np.asarray(getattr(hasher, "table", np.zeros(4, np.uint32)), np.uint32)
    mul_const = np.uint32(getattr(hasher, "mul_const", 0))
    return key, table, mul_const


def _pad_length(n: int, l: int) -> int:
    """Bucketed padding to bound jit recompiles."""
    base = max(n, l, 16)
    # next power of two, but at least l
    p = 1 << (base - 1).bit_length()
    return max(p, l)


def run_pipeline(
    codes_np: np.ndarray,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = MODE_MINIMIZERS,
    ambiguous_np: np.ndarray | None = None,
):
    """Host wrapper: pad, run the jitted pipeline, slice to the real count.

    Returns positions (uint32 np array), or (positions, superkmer indices).
    """
    l = k + w - 1
    n = int(codes_np.shape[0])
    if mode == MODE_OPEN_SYNCMERS:
        assert w % 2 == 1, "open syncmers require odd w"
    if hasher.canonical:
        assert l % 2 == 1, f"window length l={l} must be odd to determine strand"
    empty = np.zeros(0, dtype=np.uint32)
    if n < l:
        return (empty, empty) if mode == MODE_SUPERKMERS else empty
    N = _pad_length(n, l)
    codes = np.zeros(N, dtype=np.uint8)
    codes[:n] = codes_np
    ambiguous = np.zeros(N, dtype=np.uint8)
    skip_ambiguous = ambiguous_np is not None
    if skip_ambiguous:
        ambiguous[:n] = ambiguous_np
    key, table, mul_const = hasher_jit_args(hasher)
    res = _jit_pipeline(
        jnp.asarray(codes),
        jnp.int32(n),
        jnp.asarray(ambiguous),
        jnp.asarray(table),
        jnp.asarray(mul_const),
        k=k,
        w=w,
        mode=mode,
        skip_ambiguous=skip_ambiguous,
        hasher_key=key,
    )
    if mode == MODE_SUPERKMERS:
        out, idx, count = res
        cnt = int(count)
        return np.asarray(out)[:cnt], np.asarray(idx)[:cnt]
    out, count = res
    return np.asarray(out)[: int(count)]
