"""Diagnose the cross-record pipeline's on-chip behavior phase by phase.

records_ab measured the depth-2 pipeline 12x SLOWER than the serial loop
through the axon tunnel (pipelined ~12 s/record ~= one compile, serial
~1 s/record). This script times each phase of both schedules on small
records to localize where the pipelined wall time goes:

  launch  = pack + transfer + enqueue (async dispatch)
  harvest = count fetch + sliced output fetch (the only sync)

Run on the real chip: python bench/diag_records.py [--nrec 4] [--mbp 8]
Prints one JSON line per schedule with per-record phase times.
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
    ap.add_argument("--nrec", type=int, default=4)
    ap.add_argument("--mbp", type=float, default=8.0)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--w", type=int, default=11)
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
    l = k + w - 1
    h = NtHasher(k, canonical=True)
    rng = np.random.default_rng(0x5EC)
    n = int(args.mbp * 1e6)
    recs = [rng.integers(0, 4, n, dtype=np.uint8) for _ in range(args.nrec)]
    G = fused.long_span_grid(n, l, 1 << 29)

    # warm (compile once)
    fused.fused_sketch(recs[0], k, w, h, G=G, dna=True)

    def serial():
        rows = []
        for r in recs:
            t0 = time.perf_counter()
            hnd = fused._fused_launch(r, k, w, h, G=G, dna=True)
            t1 = time.perf_counter()
            out = fused._fused_harvest(hnd, "minimizers")
            t2 = time.perf_counter()
            rows.append({"launch_s": round(t1 - t0, 4),
                         "harvest_s": round(t2 - t1, 4),
                         "cnt": int(out.size)})
        return rows

    def pipelined():
        rows = []
        pending = []
        for r in recs:
            t0 = time.perf_counter()
            pending.append(fused._fused_launch(r, k, w, h, G=G, dna=True))
            t1 = time.perf_counter()
            row = {"launch_s": round(t1 - t0, 4)}
            if len(pending) > 1:
                t2 = time.perf_counter()
                out = fused._fused_harvest(pending.pop(0), "minimizers")
                row["harvest_s"] = round(time.perf_counter() - t2, 4)
                row["cnt"] = int(out.size)
            rows.append(row)
        while pending:
            t2 = time.perf_counter()
            out = fused._fused_harvest(pending.pop(0), "minimizers")
            rows.append({"drain_harvest_s": round(time.perf_counter() - t2, 4),
                         "cnt": int(out.size)})
        return rows

    t0 = time.perf_counter()
    s_rows = serial()
    s_total = time.perf_counter() - t0
    t0 = time.perf_counter()
    p_rows = pipelined()
    p_total = time.perf_counter() - t0
    print(json.dumps({"metric": "records_diag", "nrec": args.nrec,
                      "mbp": args.mbp,
                      "serial_total_s": round(s_total, 3),
                      "pipelined_total_s": round(p_total, 3),
                      "serial": s_rows, "pipelined": p_rows}))


if __name__ == "__main__":
    main()
