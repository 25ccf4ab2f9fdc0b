"""FASTA ingestion (the bench crate's needletail path,
/root/reference/bench/src/lib.rs:51-82).

`read_fasta` parses a FASTA file (optionally gzip) into per-record
`FastaRecord`s holding 2-bit codes + ambiguity masks, using the native C++
scanner (simd_minimizers_tpu.native) with a NumPy fallback.

`read_human_genome()` mirrors the reference's helper: reads
`human-genome.fa` (CHM13 T2T) from the working directory or
$HUMAN_GENOME_FA and returns the records.
"""

from __future__ import annotations

import dataclasses
import gzip
import os

import numpy as np

from .. import native
from .packed import PackedNSeqVec, PackedSeqVec


@dataclasses.dataclass
class FastaRecord:
    name: str
    codes: np.ndarray  # uint8 2-bit codes
    ambiguous: np.ndarray  # uint8 0/1

    def __len__(self) -> int:
        return self.codes.size

    def to_nseq(self) -> PackedNSeqVec:
        return PackedNSeqVec(PackedSeqVec.from_codes(self.codes), self.ambiguous.astype(bool))


def _record_names(buf: bytes) -> list[str]:
    names = []
    i = 0
    while True:
        j = buf.find(b">", i)
        if j < 0:
            break
        e = buf.find(b"\n", j)
        if e < 0:
            e = len(buf)
        names.append(buf[j + 1 : e].split(b"\r")[0].split(b" ")[0].decode("ascii", "replace"))
        i = e
    return names


def read_fasta(path: str) -> list[FastaRecord]:
    """Parse a FASTA (.fa / .fa.gz) file into records."""
    opener = gzip.open if path.endswith((".gz", ".bgz")) else open
    with opener(path, "rb") as f:
        raw = f.read()
    names = _record_names(raw)
    buf = np.frombuffer(raw, np.uint8)
    codes, amb, starts = native.fasta_scan(buf, max_records=max(len(names), 1) + 1)
    nrec = starts.size - 1
    if not names:
        names = [f"seq{i}" for i in range(nrec)]
    recs = []
    for i in range(nrec):
        s, e = int(starts[i]), int(starts[i + 1])
        recs.append(FastaRecord(names[i] if i < len(names) else f"seq{i}",
                                codes[s:e], amb[s:e]))
    return recs


def read_human_genome(path: str | None = None) -> list[FastaRecord]:
    """CHM13 T2T ingestion helper (reference bench/src/lib.rs:51-82)."""
    path = path or os.environ.get("HUMAN_GENOME_FA", "human-genome.fa")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found; download CHM13 (see reference README.md:91-92) "
            "or set $HUMAN_GENOME_FA"
        )
    return read_fasta(path)
