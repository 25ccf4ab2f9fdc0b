"""Diagnose the cross-record pipeline's on-chip behavior phase by phase.

records_ab (round 3) measured the depth-2 pipeline 12x SLOWER than the
serial loop at 16 records x 30 Mbp through the axon tunnel (~12 s/record
pipelined vs ~1 s/record serial), while 4 x 8 Mbp showed the pipeline
2.6x FASTER — the failure is scale-dependent. This script localizes it:

  schedules
    serial     launch -> harvest per record (the A/B control)
    manual2    hand-rolled depth-2 queue over _fused_launch/_fused_harvest
    records    fused.sketch_records itself (the FASTA CLI default path)

  phases (per record, attributed to the RECORD THE PHASE BELONGS TO)
    launch  = pack + transfer + enqueue (async dispatch)
    harvest = count fetch + sliced output fetch (the only sync)

Record sizes may vary: --mbp takes either one float or a comma list
(cycled over --nrec). Defaults reproduce the regressing configuration.

Run on the real chip:
  python bench/diag_records.py [--nrec 16] [--mbp 30] [--schedules serial,manual2,records]
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
    ap.add_argument("--mbp", type=str, default="30",
                    help="Mbp per record: one float or comma list (cycled)")
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--w", type=int, default=11)
    ap.add_argument("--schedules", type=str, default="serial,manual2,records")
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
    sizes_mbp = [float(x) for x in args.mbp.split(",")]
    recs = [rng.integers(0, 4, int(sizes_mbp[i % len(sizes_mbp)] * 1e6),
                         dtype=np.uint8) for i in range(args.nrec)]
    total_bp = sum(r.size for r in recs)
    Gs = [fused.long_span_grid(r.size, l, 1 << 29) for r in recs]

    # warm: compile every distinct grid bucket once up front so no
    # schedule pays a compile inside its timed region
    for G in sorted(set(Gs)):
        nwarm = min(G * fused.RB * fused.DEF_C + l, max(r.size for r in recs))
        fused.fused_sketch(recs[0][:nwarm], k, w, h, G=G, dna=True)

    def serial():
        rows = [{} for _ in recs]
        for i, r in enumerate(recs):
            t0 = time.perf_counter()
            hnd = fused._fused_launch(r, k, w, h, G=Gs[i], dna=True)
            t1 = time.perf_counter()
            out = fused._fused_harvest(hnd, "minimizers")
            t2 = time.perf_counter()
            rows[i] = {"launch_s": round(t1 - t0, 4),
                       "harvest_s": round(t2 - t1, 4),
                       "cnt": int(out.size)}
        return rows

    def manual2():
        # each phase lands in the row of the record it belongs to
        rows = [{} for _ in recs]
        pending = []  # (record idx, handles)

        def harvest_one():
            ri, hnd = pending.pop(0)
            t0 = time.perf_counter()
            out = fused._fused_harvest(hnd, "minimizers")
            rows[ri]["harvest_s"] = round(time.perf_counter() - t0, 4)
            rows[ri]["cnt"] = int(out.size)

        for i, r in enumerate(recs):
            t0 = time.perf_counter()
            pending.append((i, fused._fused_launch(r, k, w, h, G=Gs[i],
                                                   dna=True)))
            rows[i]["launch_s"] = round(time.perf_counter() - t0, 4)
            if len(pending) > 1:
                harvest_one()
        while pending:
            harvest_one()
        return rows

    def records():
        # the production path itself — only total time is observable
        out = fused.sketch_records(recs, k, w, h, dna=True)
        return [{"cnt": int(o.size)} for o in out]

    report = {"metric": "records_diag", "nrec": args.nrec,
              "mbp": sizes_mbp, "bp": total_bp, "grids": sorted(set(Gs))}
    for name in args.schedules.split(","):
        fn = {"serial": serial, "manual2": manual2, "records": records}[name]
        t0 = time.perf_counter()
        rows = fn()
        total = time.perf_counter() - t0
        report[f"{name}_total_s"] = round(total, 3)
        report[f"{name}_ns_per_bp"] = round(total / total_bp * 1e9, 4)
        report[name] = rows
    print(json.dumps(report))


if __name__ == "__main__":
    main()
