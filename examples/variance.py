"""Minimizer density / count-variance study (reference examples/variance.rs).

    python examples/variance.py --k 21 --w 11 --len 10000 --reps 200
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--w", type=int, default=11)
    ap.add_argument("--len", type=int, dest="length", default=10000)
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import oracle

    rng = np.random.default_rng(42)
    h = NtHasher(args.k, canonical=False)
    counts = []
    for _ in range(args.reps):
        codes = rng.integers(0, 4, args.length, dtype=np.uint8)
        pos = oracle.collect_and_dedup(oracle.selected_stream(codes, args.k, args.w, h))
        counts.append(pos.size)
    counts = np.asarray(counts, np.float64)
    nw = args.length - (args.k + args.w - 1) + 1
    print(f"k={args.k} w={args.w} len={args.length} reps={args.reps}")
    print(f"density  mean={counts.mean() / nw:.5f}  expected 2/(w+1)={2 / (args.w + 1):.5f}")
    print(f"count    mean={counts.mean():.2f}  var={counts.var():.2f}  "
          f"var/mean={counts.var() / counts.mean():.4f}")


if __name__ == "__main__":
    main()
