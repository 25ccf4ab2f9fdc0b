"""Native (C++) host helpers, built on first use with graceful fallback.

The compute path is JAX/Pallas on TPU; this package holds the host-side
runtime pieces the reference implements natively (packed-seq's SIMD
packing, the bench crate's needletail FASTA ingestion,
/root/reference/bench/src/lib.rs:51-82): ASCII->2-bit packing, ambiguity
masks, and a one-pass FASTA scanner. Compiled from packseq.cpp with
g++ -O3 -march=native into a cached shared library; if no toolchain is
available every entry point falls back to vectorized NumPy.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "packseq.cpp")
_lib = None
_tried = False


def _build_and_load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from .. import cache_dir

        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        # per-user 0700 cache dir: nobody else can pre-plant the .so
        cache = os.path.join(cache_dir(), f"packseq_{tag}.so")
        if not os.path.exists(cache):
            tmp = cache + f".{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, cache)
        lib = ctypes.CDLL(cache)
        lib.pack_ascii.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                   ctypes.c_void_p, ctypes.c_void_p]
        lib.pack_2bit.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
        lib.pack_2bit_striped.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_int64, ctypes.c_int64,
                                          ctypes.c_int64, ctypes.c_void_p]
        lib.pack_bytes_striped.argtypes = lib.pack_2bit_striped.argtypes
        lib.pack_2bit_rowstriped.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        lib.pack_2bit_rowstriped_multi.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        lib.fasta_scan.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                   ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_int64]
        lib.fasta_scan.restype = ctypes.c_int64
        lib.kmer_values_u64.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


_IS_ACGT = np.zeros(256, dtype=bool)
for _c in b"ACGTacgt":
    _IS_ACGT[_c] = True


def pack_ascii(ascii_arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codes, ambiguous) for a uint8 ASCII array."""
    n = ascii_arr.size
    lib = _build_and_load()
    codes = np.empty(n, np.uint8)
    amb = np.empty(n, np.uint8)
    if lib is not None and n:
        ascii_arr = np.ascontiguousarray(ascii_arr, np.uint8)
        lib.pack_ascii(_ptr(ascii_arr), n, _ptr(codes), _ptr(amb))
        return codes, amb
    codes = ((ascii_arr >> 1) & 3).astype(np.uint8)
    amb = (~_IS_ACGT[ascii_arr]).astype(np.uint8)
    return codes, amb


def pack_2bit(codes: np.ndarray) -> np.ndarray:
    """4-bases-per-byte packing (base i at bits 2*(i%4))."""
    n = codes.size
    out = np.zeros((n + 3) // 4, np.uint8)
    lib = _build_and_load()
    if lib is not None and n:
        codes = np.ascontiguousarray(codes, np.uint8)
        lib.pack_2bit(_ptr(codes), n, _ptr(out))
        return out
    pad = (-n) % 4
    c = np.concatenate([codes, np.zeros(pad, np.uint8)]) if pad else codes
    quads = c.reshape(-1, 4)
    shifts = (np.arange(4, dtype=np.uint8) * 2)[None, :]
    return np.bitwise_or.reduce((quads << shifts).astype(np.uint8), axis=1)


def fasta_scan(buf: np.ndarray, max_records: int = 1 << 20):
    """One-pass FASTA parse of a uint8 buffer.

    Returns (codes, ambiguous, starts) where starts[i]..starts[i+1] spans
    record i in the concatenated codes/ambiguous arrays.
    """
    lib = _build_and_load()
    n = buf.size
    codes = np.empty(n, np.uint8)
    amb = np.empty(n, np.uint8)
    starts = np.empty(max_records + 1, np.int64)
    if lib is not None:
        buf = np.ascontiguousarray(buf, np.uint8)
        nrec = lib.fasta_scan(_ptr(buf), n, _ptr(codes), _ptr(amb),
                              _ptr(starts), max_records)
        if nrec < 0:
            raise ValueError("too many FASTA records")
        total = int(starts[nrec])
        # views, not copies: total is within ~2% of n for real FASTA
        # (newlines+headers), and copying 2x1 GB at this host's ~100 MB/s
        # memory bandwidth costs ~20 s per genome
        return codes[:total], amb[:total], starts[: nrec + 1].copy()
    # NumPy fallback: line-oriented
    text = buf.tobytes()
    seqs, names = [], []
    cur = []
    for line in text.split(b"\n"):
        line = line.rstrip(b"\r")
        if line.startswith(b">"):
            if cur or names:
                seqs.append(b"".join(cur))
                cur = []
            names.append(line)
        elif line:
            cur.append(line)
    if cur or names:  # a buffer with no data at all has zero records
        seqs.append(b"".join(cur))
    if len(seqs) > len(names):  # headerless
        names = [b""] * len(seqs)
    if names and len(seqs) < len(names):
        seqs.append(b"")
    starts_l = [0]
    codes_l, amb_l = [], []
    for s in seqs:
        arr = np.frombuffer(s, np.uint8)
        c, a = pack_ascii(arr)
        codes_l.append(c)
        amb_l.append(a)
        starts_l.append(starts_l[-1] + arr.size)
    return (
        np.concatenate(codes_l) if codes_l else np.zeros(0, np.uint8),
        np.concatenate(amb_l) if amb_l else np.zeros(0, np.uint8),
        np.asarray(starts_l, np.int64),
    )


def available() -> bool:
    return _build_and_load() is not None


def kmer_values_u64(codes: np.ndarray, positions: np.ndarray, k: int,
                    canonical: bool) -> np.ndarray | None:
    """Packed u64 k-mer values at positions (2-bit codes); None if no
    native library (caller falls back to the NumPy path)."""
    lib = _build_and_load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    positions = np.ascontiguousarray(positions, np.uint32)
    out = np.empty(positions.size, np.uint64)
    lib.kmer_values_u64(_ptr(codes), _ptr(positions),
                        ctypes.c_int64(positions.size), ctypes.c_int64(k),
                        ctypes.c_int(1 if canonical else 0), _ptr(out))
    return out


def rowstriped_need_chars_raw(nblocks: int, bc: int, c0: int, spw: int) -> int:
    """Input chars pack_2bit_rowstriped reads for this geometry (the last
    row of the last block spans 16*spw chars). Single source of the
    span-size formula — ops.fused.rowstriped_need_chars delegates here."""
    return (nblocks - 1) * bc + (bc // c0 - 1) * c0 + 16 * spw if nblocks else 0


def pack_2bit_rowstriped(codes: np.ndarray, nblocks: int, bc: int, c0: int,
                         sp: int, spw: int, spw_pad: int) -> np.ndarray:
    """Row-striped 2-bit packing: (8, spw_pad) words per block, row r of
    block b covering chars [b*bc + r*c0, +sp) striped over 16 phases."""
    lib = _build_and_load()
    out = np.zeros(nblocks * 8 * spw_pad, np.uint32)
    if lib is not None and nblocks:
        codes = np.ascontiguousarray(codes, np.uint8)
        lib.pack_2bit_rowstriped(_ptr(codes), nblocks, bc, c0, sp, spw,
                                 spw_pad, _ptr(out))
        return out
    out3 = out.reshape(nblocks, 8, spw_pad)
    for b in range(nblocks):
        for r in range(8):
            base = b * bc + r * c0
            for t in range(16):
                seg = codes[base + t * spw : base + t * spw + spw]
                out3[b, r, :spw] |= (seg.astype(np.uint32) & 3) << np.uint32(2 * t)
    return out


def pack_2bit_rowstriped_multi(codes: np.ndarray, starts: np.ndarray,
                               lens: np.ndarray, nblocks: int, bc: int,
                               c0: int, sp: int, spw: int,
                               spw_pad: int) -> np.ndarray:
    """Row-striped packing of ndev spans of `codes` in one native call.

    Span d starts at char starts[d] and exposes lens[d] chars (reads past
    its length yield 0). Returns (ndev, nblocks*8, spw_pad) uint32 — the
    concatenation of per-span pack_2bit_rowstriped results, with no
    intermediate padded span copies.
    """
    starts = np.ascontiguousarray(starts, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    ndev = int(starts.size)
    lib = _build_and_load()
    out = np.zeros(ndev * nblocks * 8 * spw_pad, np.uint32)
    if lib is not None and ndev and nblocks:
        codes = np.ascontiguousarray(codes, np.uint8)
        lib.pack_2bit_rowstriped_multi(_ptr(codes), _ptr(starts), _ptr(lens),
                                       ndev, nblocks, bc, c0, sp, spw,
                                       spw_pad, _ptr(out))
        return out.reshape(ndev, nblocks * 8, spw_pad)
    out3 = out.reshape(ndev, nblocks * 8, spw_pad)
    need = rowstriped_need_chars_raw(nblocks, bc, c0, spw)
    for d in range(ndev):
        span = np.zeros(max(need, 0), np.uint8)
        ln = int(lens[d])
        span[:ln] = codes[int(starts[d]) : int(starts[d]) + ln]
        out3[d] = pack_2bit_rowstriped(span, nblocks, bc, c0, sp, spw,
                                       spw_pad).reshape(nblocks * 8, spw_pad)
    return out3


def pack_bytes_striped(codes: np.ndarray, nblocks: int, bc: int,
                       slabw: int, slabw_pad: int) -> np.ndarray:
    """Striped byte packing (4 chars/word, 8-bit fields) for general-ASCII
    fused-kernel input; layout mirrors pack_2bit_striped with 4 phases."""
    lib = _build_and_load()
    out = np.zeros(nblocks * slabw_pad, np.uint32)
    if lib is not None and nblocks:
        codes = np.ascontiguousarray(codes, np.uint8)
        lib.pack_bytes_striped(_ptr(codes), nblocks, bc, slabw, slabw_pad, _ptr(out))
        return out
    out2 = out.reshape(nblocks, slabw_pad)
    v = np.lib.stride_tricks.as_strided(
        codes, shape=(nblocks, 4 * slabw), strides=(bc * codes.strides[0], codes.strides[0])
    )
    for t in range(4):
        out2[:, :slabw] |= v[:, t * slabw : (t + 1) * slabw].astype(np.uint32) << np.uint32(8 * t)
    return out


def pack_2bit_striped(codes: np.ndarray, nblocks: int, bc: int,
                      slabw: int, slabw_pad: int) -> np.ndarray:
    """Striped 2-bit packing for the fused kernel's in-VMEM decode.

    Block b's word m packs chars {b*bc + t*slabw + m : t<16}, char t at
    bits 2t. `codes` must cover nblocks*bc + 16*slabw chars.
    Returns uint32 array of nblocks * slabw_pad words.
    """
    lib = _build_and_load()
    out = np.zeros(nblocks * slabw_pad, np.uint32)
    if lib is not None and nblocks:
        codes = np.ascontiguousarray(codes, np.uint8)
        lib.pack_2bit_striped(_ptr(codes), nblocks, bc, slabw, slabw_pad, _ptr(out))
        return out
    # vectorized fallback: overlapping block view via stride tricks
    out2 = out.reshape(nblocks, slabw_pad)
    v = np.lib.stride_tricks.as_strided(
        codes, shape=(nblocks, 16 * slabw), strides=(bc * codes.strides[0], codes.strides[0])
    )
    for t in range(16):
        out2[:, :slabw] |= (v[:, t * slabw : (t + 1) * slabw].astype(np.uint32) & 3) << np.uint32(2 * t)
    return out
