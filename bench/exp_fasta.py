"""Real-FASTA end-to-end benchmark: file on disk -> per-record positions.

Exercises the exact FASTA CLI path (examples/sketch_fasta.py): native C++
fasta_scan -> per-record 2-bit codes -> backend.sketch_records (wave
launch schedule on TPU) — the pipeline the reference's paper harness
drives with needletail + rayon (/root/reference/bench/src/lib.rs:51-82,
bench/src/bin/paper.rs:397-461).

Input resolution order:
  1. $SMTPU_FASTA_E2E if set,
  2. $HUMAN_GENOME_FA / ./human-genome.fa if present (real CHM13),
  3. a synthetic multi-record FASTA (default 24 records x 45 Mbp =
     1.08 Gbp, 0.1% N, 60-char lines, mixed case) generated once and
     cached at /tmp/smtpu_fasta_e2e_<size>.fa.

Run on the real chip: python bench/exp_fasta.py [--records 24] [--mbp 45]
Prints one JSON line (also importable: bench_fasta_e2e(quick)).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# ACGT in packed-seq 2-bit code order A=00 C=01 T=10 G=11
# (/root/reference/src/lib.rs:121-128)
_CODE2ASCII = np.frombuffer(b"ACTG", np.uint8)


def synth_fasta(path: str, nrec: int, mbp: float, seed: int = 0xFA57A):
    """Write a multi-record FASTA: random ACGT, 0.1% N, 60-char lines,
    every 3rd record lowercase (the parser must case-fold)."""
    rng = np.random.default_rng(seed)
    n = int(mbp * 1e6)
    width = 60
    with open(path + ".tmp", "wb") as f:
        for ri in range(nrec):
            f.write(f">synth{ri} length={n}\n".encode())
            chars = _CODE2ASCII[rng.integers(0, 4, n, dtype=np.uint8)]
            chars[rng.random(n) < 0.001] = ord("N")
            if ri % 3 == 2:
                chars |= 0x20  # lowercase
            rows = -(-n // width)
            pad = rows * width - n
            cells = np.zeros(rows * width, np.uint8)
            cells[:n] = chars
            mat = np.empty((rows, width + 1), np.uint8)
            mat[:, :width] = cells.reshape(rows, width)
            mat[:, width] = ord("\n")
            buf = mat.reshape(-1)
            if pad:
                # drop padding cells of the ragged last line, keep its \n
                f.write(buf[: rows * (width + 1) - pad - 1].tobytes())
                f.write(b"\n")
            else:
                f.write(buf.tobytes())
    os.replace(path + ".tmp", path)


def resolve_fasta(nrec: int, mbp: float) -> tuple[str, str]:
    """(path, source-label) per the resolution order above."""
    p = os.environ.get("SMTPU_FASTA_E2E")
    if p:
        return p, "env"
    p = os.environ.get("HUMAN_GENOME_FA", "human-genome.fa")
    if os.path.exists(p):
        return p, "chm13"
    path = f"/tmp/smtpu_fasta_e2e_{nrec}x{int(mbp)}.fa"
    if not os.path.exists(path):
        t0 = time.perf_counter()
        synth_fasta(path, nrec, mbp)
        print(f"[fasta_e2e] wrote {path} in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    return path, "synthetic-file"


def bench_fasta_e2e(quick: bool = False, nrec: int = 24, mbp: float = 45.0,
                    k: int = 21, w: int = 11):
    if quick:
        nrec, mbp = 4, 30.0
    path, source = resolve_fasta(nrec, mbp)

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import backend
    from simd_minimizers_tpu.seq.fasta import read_fasta

    h = NtHasher(k, canonical=True)
    t0 = time.perf_counter()
    recs = read_fasta(path)
    parse_s = time.perf_counter() - t0
    total_bp = sum(len(r) for r in recs)

    # the CLI default path: no skip-ambiguous (N folds to code 0, as the
    # reference's PackedSeqVec::from_ascii does), dna=True from the scanner.
    # Sketch twice: the first call may pay a one-time Mosaic compile for a
    # never-seen grid bucket (persistent-cached across processes; measured
    # ~7 min through the tunnel for G=1024), the second is the steady state
    # a CLI user sees from the second genome on.
    t0 = time.perf_counter()
    all_pos = backend.sketch_records([r.codes for r in recs], k, w, h,
                                     dna=True)
    sketch_cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    all_pos = backend.sketch_records([r.codes for r in recs], k, w, h,
                                     dna=True)
    sketch_s = time.perf_counter() - t0
    npos = int(sum(p.size for p in all_pos))
    total_s = parse_s + sketch_s
    res = {
        "metric": "fasta_e2e",
        "source": source,
        "path": os.path.basename(path),
        "records": len(recs),
        "bp": int(total_bp),
        "k": k, "w": w, "canonical": True,
        "parse_s": round(parse_s, 3),
        "sketch_cold_s": round(sketch_cold_s, 3),
        "sketch_s": round(sketch_s, 3),
        "total_s": round(total_s, 3),
        "value": round(total_bp / total_s / 1e9, 3),
        "unit": "Gbp/s",
        "positions": npos,
        "density": round(npos / max(total_bp - len(recs) * (k + w - 2), 1), 5),
    }
    print(f"[fasta_e2e] {source}: parse {parse_s:.2f}s + sketch "
          f"{sketch_s:.2f}s = {total_bp/total_s/1e9:.3f} Gbp/s "
          f"({len(recs)} records, {total_bp/1e9:.2f} Gbp)", file=sys.stderr)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=24)
    ap.add_argument("--mbp", type=float, default=45.0)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--w", type=int, default=11)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from simd_minimizers_tpu import cache_dir
    from simd_minimizers_tpu.utils.device import acquire_devices_or_exit

    acquire_devices_or_exit(
        float(os.environ.get("SMTPU_DEVICE_TIMEOUT_S", "900")))
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir("jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    print(json.dumps(bench_fasta_e2e(args.quick, args.records, args.mbp,
                                     args.k, args.w)))


if __name__ == "__main__":
    main()
