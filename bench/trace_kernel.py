"""Capture a jax.profiler trace of the production kernel and distill a
committable per-op attribution (bench/trace_r4.json).

The stage-level attribution comes from bench/exp_kernel.py ablations
(one process per ablate point); this adds the XProf view: per-op device
durations inside the single fused Mosaic kernel plus everything around
it (infeed/outfeed, dispatch gaps), so the "VPU-bound" claim is
trace-backed rather than inferred.

Usage (real TPU): python bench/trace_kernel.py [--n 100000000]
Writes bench/trace_r4.json and prints the top ops to stderr.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10**8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "trace_r4.json"))
    args = ap.parse_args()

    import jax

    from simd_minimizers_tpu import cache_dir
    from simd_minimizers_tpu.utils import profiling

    jax.config.update("jax_compilation_cache_dir", cache_dir("jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import fused as F
    from simd_minimizers_tpu.ops.pipeline import hasher_jit_args

    k, w, n = 21, 11, args.n
    l = k + w - 1
    C = F.DEF_C
    BC = F.RB * C
    nw = n - l + 1
    G = -(-nw // BC)
    rng = np.random.default_rng(0xBEEF)
    PADH = F.padh_for(l)
    codes = np.zeros(F.rowstriped_need_chars(G, C, PADH), np.uint8)
    codes[:n] = rng.integers(0, 4, n, dtype=np.uint8)
    h = NtHasher(k, canonical=True)
    key, table, mul_const = hasher_jit_args(h)
    call_args = (
        jnp.asarray(F.pack_rowstriped(codes, G, C, PADH)),
        jnp.zeros(F.TAIL, jnp.uint32),
        jnp.asarray([nw, 0], np.int32),
        jnp.asarray(table), jnp.asarray([mul_const], np.uint32),
    )
    kw = dict(k=k, w=w, mode="minimizers", skip_ambiguous=False,
              hasher_key=key, C=C, G=G, input_mode="striped2r")
    jax.block_until_ready(call_args)
    r = F._fused_call(*call_args, **kw)
    int(r[2][0])  # compile + warm

    logdir = "/tmp/smtpu_trace_r3"
    with profiling.trace(logdir):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = F._fused_call(*call_args, **kw)
        int(r[2][0])
        wall = time.perf_counter() - t0

    # distill: per-op totals from the device plane of the xplane proto
    pbs = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    assert pbs, f"no xplane capture under {logdir}"
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(pbs[-1])
    ops: dict[str, float] = {}
    planes = []
    for plane in pd.planes:
        planes.append(plane.name)
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = (ev.end_ns - ev.start_ns) / 1e9
                ops[ev.name] = ops.get(ev.name, 0.0) + dur
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:25]
    total_dev = sum(ops.values())
    result = {
        "config": {"k": k, "w": w, "n": n, "C": C, "G": G, "reps": args.reps,
                   "compact": "rowplace"},
        "wall_s": round(wall, 4),
        "ns_per_bp_wall": round(wall / args.reps / n * 1e9, 4),
        "planes": planes,
        "top_ops_s": [{"op": name, "s": round(s, 5),
                       "pct": round(100 * s / total_dev, 1)}
                      for name, s in top],
        "note": ("per-op device durations over all reps; the fused Mosaic "
                 "kernel appears as one custom-call op — stage-level "
                 "attribution inside it comes from bench/exp_kernel.py "
                 "--ablate points (see README ablation)"),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    for row in top[:12]:
        print(f"[trace] {row[1]*1e3:8.2f} ms  {row[0][:90]}", file=sys.stderr)
    print(f"[trace] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
