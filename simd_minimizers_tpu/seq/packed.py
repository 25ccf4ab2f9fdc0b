"""Sequence containers: the packed-seq equivalent layer.

Reproduces the behavior of the `packed-seq` crate (v5) as used by the
reference (see SURVEY.md §2.2 and /root/reference/src/lib.rs:57-64):

- 2-bit DNA codes ``A=00, C=01, T=10, G=11`` (reference src/lib.rs:121-128).
- ``PackedSeqVec``: 4 bases/byte, base ``i`` stored at bits ``2*(i%4)`` of
  byte ``i//4``; supports slicing at non-byte offsets.
- ``AsciiSeqVec``: ACGT bytes; same 2-bit code stream via ``(c >> 1) & 3``.
- Plain ``bytes``/``np.uint8`` arrays are accepted as general ASCII text
  (``&[u8]`` in the reference), whose "codes" are the raw byte values.
- ``PackedNSeqVec``: packed sequence + per-base ambiguity mask (non-ACGT).

``read_kmer`` / ``read_revcomp_kmer`` return Python ints (arbitrary width,
covering the reference's u64/u128 variants).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# ASCII -> 2-bit code table: (c >> 1) & 3 maps A->0, C->1, T->2, G->3
# (both cases). Other characters map pseudo-randomly; ambiguity is tracked
# separately by PackedNSeqVec (as in packed-seq).
_ASCII_TO_CODE = ((np.arange(256, dtype=np.uint8) >> 1) & 3).astype(np.uint8)
_CODE_TO_ASCII = np.frombuffer(b"ACTG", dtype=np.uint8)
_IS_ACGT = np.zeros(256, dtype=bool)
for _c in b"ACGTacgt":
    _IS_ACGT[_c] = True

COMPLEMENT_XOR = 2  # complement of a 2-bit code c is c ^ 2 (A<->T, C<->G)


def complement_codes(codes: np.ndarray) -> np.ndarray:
    return (codes ^ np.uint8(COMPLEMENT_XOR)).astype(np.uint8)


def _kmer_value(codes: np.ndarray) -> int:
    """Pack codes into an int, first base in the lowest bits.

    Matches packed-seq ``read_kmer`` (pinned by the doc-test values at
    /root/reference/src/lib.rs:120-129: CAGAG at pos 7 -> 0b11_00_11_00_01,
    i.e. value = sum(code[i] << 2*i)).
    """
    v = 0
    for i, c in enumerate(codes.tolist()):
        v |= int(c) << (2 * i)
    return v


class PackedSeq:
    """An immutable 2-bit packed DNA sequence (view or owned).

    ``data`` is a uint8 array of packed bytes; the sequence starts at base
    ``offset`` (0..3 within the first byte is allowed, mirroring packed-seq's
    non-byte-offset slices) and has ``length`` bases.
    """

    is_packed = True
    char_bits = 2

    def __init__(self, data: np.ndarray, offset: int = 0, length: int | None = None):
        assert data.dtype == np.uint8
        self.data = data
        self.offset = int(offset)
        if length is None:
            length = data.size * 4 - self.offset
        self.length = int(length)
        assert self.offset + self.length <= data.size * 4

    def __len__(self) -> int:
        return self.length

    # -- code stream ------------------------------------------------------
    def codes(self) -> np.ndarray:
        """Unpack to a uint8 array of 2-bit codes, shape (len,)."""
        nbytes = (self.offset + self.length + 3) // 4
        b = self.data[:nbytes]
        # (nbytes, 4) matrix of codes, then flatten and slice.
        shifts = np.arange(4, dtype=np.uint8) * 2
        all_codes = ((b[:, None] >> shifts[None, :]) & 3).astype(np.uint8).reshape(-1)
        return all_codes[self.offset : self.offset + self.length]

    def slice(self, start: int, end: int) -> "PackedSeq":
        assert 0 <= start <= end <= self.length
        return PackedSeq(self.data, self.offset + start, end - start)

    # -- kmer access -------------------------------------------------------
    def read_kmer(self, length: int, pos: int) -> int:
        return _kmer_value(self.codes()[pos : pos + length])

    def read_revcomp_kmer(self, length: int, pos: int) -> int:
        km = self.codes()[pos : pos + length]
        return _kmer_value(complement_codes(km)[::-1])

    def to_revcomp(self) -> "PackedSeqVec":
        rc = complement_codes(self.codes())[::-1]
        return PackedSeqVec.from_codes(rc)

    def to_ascii(self) -> bytes:
        return _CODE_TO_ASCII[self.codes()].tobytes()

    # -- packed access for device pipelines --------------------------------
    def packed_with_offset(self) -> tuple[np.ndarray, int]:
        """Packed bytes covering the sequence plus the in-byte base offset."""
        first = self.offset // 4
        last = (self.offset + self.length + 3) // 4
        return self.data[first:last], self.offset % 4

    def as_slice(self) -> "PackedSeq":
        return self


class PackedSeqVec(PackedSeq):
    """Owned packed sequence (the `PackedSeqVec` equivalent)."""

    @staticmethod
    def from_ascii(seq: bytes | np.ndarray) -> "PackedSeqVec":
        arr = np.frombuffer(bytes(seq), dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else np.asarray(seq, dtype=np.uint8)
        return PackedSeqVec.from_codes(_ASCII_TO_CODE[arr])

    @staticmethod
    def from_codes(codes: np.ndarray) -> "PackedSeqVec":
        codes = np.asarray(codes, dtype=np.uint8)
        n = codes.size
        pad = (-n) % 4
        if pad:
            codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
        quads = codes.reshape(-1, 4)
        shifts = np.arange(4, dtype=np.uint8) * 2
        data = np.bitwise_or.reduce((quads << shifts[None, :]).astype(np.uint8), axis=1)
        return PackedSeqVec(np.ascontiguousarray(data), 0, n)

    @staticmethod
    def random(n: int, rng: np.random.Generator | None = None) -> "PackedSeqVec":
        rng = rng or np.random.default_rng()
        return PackedSeqVec.from_codes(rng.integers(0, 4, size=n, dtype=np.uint8))


class AsciiSeq:
    """DNA given as ACGT ASCII bytes (the `AsciiSeq` equivalent)."""

    is_packed = False
    char_bits = 2

    def __init__(self, seq: bytes | np.ndarray):
        if isinstance(seq, (bytes, bytearray)):
            seq = np.frombuffer(bytes(seq), dtype=np.uint8)
        self.seq = np.asarray(seq, dtype=np.uint8)

    def __len__(self) -> int:
        return self.seq.size

    def codes(self) -> np.ndarray:
        return _ASCII_TO_CODE[self.seq]

    def slice(self, start: int, end: int) -> "AsciiSeq":
        return AsciiSeq(self.seq[start:end])

    def read_kmer(self, length: int, pos: int) -> int:
        return _kmer_value(self.codes()[pos : pos + length])

    def read_revcomp_kmer(self, length: int, pos: int) -> int:
        km = self.codes()[pos : pos + length]
        return _kmer_value(complement_codes(km)[::-1])

    def to_revcomp(self) -> "AsciiSeq":
        comp = _CODE_TO_ASCII[complement_codes(self.codes())[::-1]]
        return AsciiSeq(comp)

    def as_slice(self) -> "AsciiSeq":
        return self

    @staticmethod
    def random(n: int, rng: np.random.Generator | None = None) -> "AsciiSeq":
        rng = rng or np.random.default_rng()
        return AsciiSeq(_CODE_TO_ASCII[rng.integers(0, 4, size=n, dtype=np.uint8)])


AsciiSeqVec = AsciiSeq  # owned and view types coincide in Python


class GenericSeq:
    """General ASCII text (`&[u8]` in the reference): codes are raw bytes.

    Hashers fold chars into their scheme's space themselves (NtHasher
    masks with &3; MulHasher uses the raw byte). K-mer values pack 8 bits
    per char; the "complement" of a text char is `c ^ 2`, consistent with
    how canonical hashing treats raw codes across all tiers.
    """

    is_packed = False
    char_bits = 8

    def __init__(self, seq: bytes | np.ndarray):
        if isinstance(seq, (bytes, bytearray)):
            seq = np.frombuffer(bytes(seq), dtype=np.uint8)
        self.seq = np.asarray(seq, dtype=np.uint8)

    def __len__(self) -> int:
        return self.seq.size

    def codes(self) -> np.ndarray:
        return self.seq

    def slice(self, start: int, end: int) -> "GenericSeq":
        return GenericSeq(self.seq[start:end])

    def read_kmer(self, length: int, pos: int) -> int:
        # 8 bits per character for general text.
        v = 0
        for i, c in enumerate(self.seq[pos : pos + length].tolist()):
            v |= int(c) << (8 * i)
        return v

    def read_revcomp_kmer(self, length: int, pos: int) -> int:
        km = (self.seq[pos : pos + length] ^ np.uint8(2))[::-1]
        v = 0
        for i, c in enumerate(km.tolist()):
            v |= int(c) << (8 * i)
        return v

    def as_slice(self) -> "GenericSeq":
        return self


@dataclasses.dataclass
class PackedNSeqVec:
    """Packed sequence plus per-base ambiguity flags (`PackedNSeq`)."""

    seq: PackedSeq
    ambiguous: np.ndarray  # bool array, True where the base was not ACGT

    @staticmethod
    def from_ascii(seq: bytes | np.ndarray) -> "PackedNSeqVec":
        arr = np.frombuffer(bytes(seq), dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else np.asarray(seq, dtype=np.uint8)
        return PackedNSeqVec(PackedSeqVec.from_ascii(arr), ~_IS_ACGT[arr])

    def __len__(self) -> int:
        return len(self.seq)

    def slice(self, start: int, end: int) -> "PackedNSeqVec":
        return PackedNSeqVec(self.seq.slice(start, end), self.ambiguous[start:end])

    def as_slice(self) -> "PackedNSeqVec":
        return self


def as_seq(seq) -> "PackedSeq | AsciiSeq | GenericSeq":
    """Coerce user input into a sequence object.

    Plain bytes/str of pure ACGT/acgt are treated as ASCII DNA; any other
    byte content is general ASCII text (`&[u8]` in the reference,
    /root/reference/src/lib.rs:57-72), whose "codes" are the raw byte
    values (MulHasher recommended). Wrap in `AsciiSeq` explicitly to force
    DNA folding of arbitrary bytes, or in `GenericSeq` to force text
    semantics for ACGT-only content.
    """
    if isinstance(seq, (PackedSeq, AsciiSeq, GenericSeq, PackedNSeqVec)):
        return seq
    if isinstance(seq, str):
        seq = seq.encode()
    if isinstance(seq, (bytes, bytearray, np.ndarray)):
        arr = (
            np.frombuffer(bytes(seq), dtype=np.uint8)
            if isinstance(seq, (bytes, bytearray))
            else np.asarray(seq, dtype=np.uint8)
        )
        if bool(_IS_ACGT[arr].all()):
            return AsciiSeq(arr)
        return GenericSeq(arr)
    raise TypeError(f"unsupported sequence type: {type(seq)}")
