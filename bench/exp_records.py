"""A/B: per-record synchronized sketching vs the cross-record pipeline.

Measures what backend.sketch_records buys on a multi-record genome: the
serial loop pays (pack + transfer + compute + sync) per record, the
pipeline overlaps pack+transfer of record i+1 with device compute of
record i (depth 2). The reference's analog is rayon fan-out over
chromosomes (/root/reference/bench/src/bin/paper.rs:442-459); here one
device hides the host costs instead.

Run on the real chip:  python bench/exp_records.py [--nrec 16] [--mbp 30]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrec", type=int, default=16)
    ap.add_argument("--mbp", type=float, default=30.0, help="Mbp per record")
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--w", type=int, default=11)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from simd_minimizers_tpu import cache_dir
    from simd_minimizers_tpu.utils.device import acquire_devices_or_exit

    acquire_devices_or_exit(
        float(os.environ.get("SMTPU_DEVICE_TIMEOUT_S", "900")))
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir("jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import fused

    k, w = args.k, args.w
    h = NtHasher(k, canonical=True)
    rng = np.random.default_rng(0x5EC)
    n = int(args.mbp * 1e6)
    recs = [rng.integers(0, 4, n, dtype=np.uint8) for _ in range(args.nrec)]
    total_bp = sum(r.size for r in recs)

    # warm: compiles the one pow2-bucketed program both sides reuse
    fused.sketch_records(recs[:1], k, w, h, dna=True)

    def run_serial():
        t0 = time.perf_counter()
        cnt = 0
        for r in recs:
            cnt += fused.fused_sketch(
                r, k, w, h,
                G=fused.long_span_grid(r.size, k + w - 1, 1 << 29),
                dna=True).size
        return time.perf_counter() - t0, cnt

    def run_pipelined():
        t0 = time.perf_counter()
        out = fused.sketch_records(recs, k, w, h, dna=True)
        return time.perf_counter() - t0, sum(o.size for o in out)

    # INTERLEAVE the repeats (s,p, s,p, ...): tunnel bandwidth through the
    # axon relay swings ~4x minute-to-minute, so batching all serial
    # repeats before all pipelined ones confounds schedule with weather
    # (observed round 3/4: the same config measured 0.083x, 0.64x, and
    # 2.3x across sessions). Adjacent pairs share weather; report the
    # per-pair ratios plus the min-of-repeats times.
    pairs = []
    for _ in range(args.repeats):
        s = run_serial()
        p = run_pipelined()
        assert s[1] == p[1], (s[1], p[1])
        pairs.append((s[0], p[0]))
    w_s = min(s for s, _ in pairs)
    w_p = min(p for _, p in pairs)
    ratios = sorted(s / p for s, p in pairs)
    print(json.dumps({
        "metric": "records_pipeline_speedup",
        "nrec": args.nrec,
        "bp": total_bp,
        "serial_s": round(w_s, 3),
        "pipelined_s": round(w_p, 3),
        "value": round(ratios[len(ratios) // 2], 3),
        "unit": "x",
        "pair_speedups": [round(r, 3) for r in ratios],
        "pipelined_ns_per_bp": round(w_p / total_bp * 1e9, 4),
        "positions": int(p[1]),
    }))


if __name__ == "__main__":
    main()
