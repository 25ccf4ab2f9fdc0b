"""Quick latency probe (the reference's examples/bench.rs, min-of-samples).

    python examples/bench.py --n 10000000 --k 21 --w 11 --canonical
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10**7)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--w", type=int, default=11)
    ap.add_argument("--canonical", action="store_true")
    ap.add_argument("--samples", type=int, default=5)
    args = ap.parse_args()

    import simd_minimizers_tpu as sm
    from simd_minimizers_tpu.seq.packed import PackedSeqVec

    seq = PackedSeqVec.random(args.n, np.random.default_rng(0))
    b = (sm.canonical_minimizers if args.canonical else sm.minimizers)(args.k, args.w)
    b.run(seq)  # warm / compile
    best = min(
        (lambda t0: (b.run(seq), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(args.samples)
    )
    pos = b.run(seq).positions
    print(f"n={args.n} k={args.k} w={args.w} canonical={args.canonical}: "
          f"{best:.3f}s ({best * 1e9 / args.n:.3f} ns/bp incl. host), "
          f"{pos.size} minimizers")


if __name__ == "__main__":
    main()
