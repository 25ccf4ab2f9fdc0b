"""Headline benchmark: canonical minimizers, k=21 w=11, random DNA.

Mirrors the reference's paper benchmark config (k=21, w=11, n=10^8 random
bp, median of repeats; /root/reference/bench/src/bin/paper.rs:19-25,536-556).
Baseline to beat: 2.20 ns/bp canonical on AVX2 x86-64 (BASELINE.md).

Prints ONE JSON line:
  {"metric": "canonical_k21_w11_ns_per_bp", "value": N, "unit": "ns/bp",
   "vs_baseline": baseline/value}

Timing is steady-state device execution (input packed 2-bit resident on
device, outputs materialized on device, block_until_ready) — the deployment
shape where sequences are sketched on-TPU; the one-time host->device copy
of the 0.25 B/bp packed input is reported separately on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_NS_PER_BP = 2.20  # canonical k=21 w=11, AVX2 (bench/results.json)


def main() -> None:
    import jax

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops.device_driver import DeviceSketcher
    from simd_minimizers_tpu.ops import pipeline

    k, w = 21, 11
    n = 10**8
    repeats = 5

    dev = jax.devices()[0]
    print(f"[bench] device: {dev.platform} ({dev.device_kind})", file=sys.stderr)

    rng = np.random.default_rng(0xBEEF)
    codes = rng.integers(0, 4, n, dtype=np.uint8)

    sk = DeviceSketcher(
        k, w, NtHasher(k, canonical=True), mode=pipeline.MODE_MINIMIZERS,
        C=4096, R=1024, nchunks=-(-n // (4096 * 1024)),
    )
    t0 = time.perf_counter()
    inputs = sk.device_inputs(codes)
    for x in inputs:
        x.block_until_ready()
    t1 = time.perf_counter()
    print(f"[bench] pack+transfer: {t1 - t0:.2f}s", file=sys.stderr)

    # compile + warm-up. NOTE: under the axon tunnel block_until_ready can
    # return before device execution finishes, so every timing below syncs
    # by fetching the (scalar) count to host.
    res = sk.sketch_device(*inputs)
    count = int(res[-2])
    t2 = time.perf_counter()
    print(f"[bench] compile+first run: {t2 - t1:.2f}s", file=sys.stderr)

    # The tunnel adds ~30ms fixed latency per synchronized dispatch; enqueue
    # all repeats back-to-back (device executes them sequentially) and sync
    # once, so the fixed cost is amortized: per-run = (batch_m - batch_1)/(m-1).
    def batch(m):
        t = time.perf_counter()
        for _ in range(m):
            r = sk.sketch_device(*inputs)
        int(r[-2])  # host sync
        return time.perf_counter() - t

    batch(1)  # warm
    t1 = min(batch(1) for _ in range(3))
    tm = min(batch(repeats + 1) for _ in range(3))
    per_run = (tm - t1) / repeats
    times = [per_run]
    med = per_run
    count = int(res[-2])
    density = count / (n - k - w + 2)
    print(
        f"[bench] times: {['%.3f' % t for t in times]} s; "
        f"count={count} density={density:.4f} (expect ~{2 / (w + 1):.4f})",
        file=sys.stderr,
    )
    ns_per_bp = med * 1e9 / n
    print(
        json.dumps(
            {
                "metric": "canonical_k21_w11_ns_per_bp",
                "value": round(ns_per_bp, 4),
                "unit": "ns/bp",
                "vs_baseline": round(BASELINE_NS_PER_BP / ns_per_bp, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
