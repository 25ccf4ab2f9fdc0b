"""On-chip A/B: device-resident k-mer value extraction vs the host gather.

The reference extracts values host-side per position
(/root/reference/src/lib.rs:598-612); at human-genome scale that is
~5e8 minimizers x k bytes of random-access traffic on one core. Here the
codes are generated AND packed on device, real canonical-minimizer
positions come from the fused sketch, and ops/device_values.py assembles
u64 values with funnel shifts + 2-bit-group reversal — the host path is
timed on a slice for the per-value comparison.

Run on the real chip:  python bench/exp_values.py [--n 400000000]
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
    ap.add_argument("--n", type=int, default=400_000_000)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--w", type=int, default=11)
    ap.add_argument("--host-m", type=int, default=2_000_000,
                    help="host-path positions sample for the per-value A/B")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from simd_minimizers_tpu import cache_dir
    from simd_minimizers_tpu.utils.device import acquire_devices_or_exit

    acquire_devices_or_exit(
        float(os.environ.get("SMTPU_DEVICE_TIMEOUT_S", "900")))
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir("jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import device_values as dv
    from simd_minimizers_tpu.ops import fused
    from simd_minimizers_tpu.ops import values as hv

    k, w, n = args.k, args.w, args.n
    h = NtHasher(k, canonical=True)

    # host codes for the sketch + host A/B slice; device copy for packing
    rng = np.random.default_rng(0x5A1)
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    pos = fused.sketch_long(codes, k, w, h, dna=True)
    m = int(pos.size)

    # device: pack words on device, then extract all m values
    codes_dev = jnp.asarray(codes)
    words = dv.pack_words_jnp(codes_dev)
    jfn = dv._jit_values(k, True)
    pos_dev = jnp.asarray(pos)
    out = jfn(words, pos_dev)
    int(out[0, 0])  # sync

    def run_device():
        t0 = time.perf_counter()
        o = jfn(words, pos_dev)
        int(o[0, 0])
        return time.perf_counter() - t0

    t_dev = min(run_device() for _ in range(args.repeats))

    # host paths: WARM, median of repeats (the round-3 single cold run
    # measured first-touch page faults + CPU contention, not the code —
    # it reported ~50 us/value for what is ~0.6 us warm)
    hm = min(args.host_m, m)
    psub = np.ascontiguousarray(pos[:hm])

    def med(fn, reps):
        ts = sorted(fn() for _ in range(reps))
        return ts[len(ts) // 2]

    def t_native():
        t0 = time.perf_counter()
        hv.canonical_kmer_values_u64(codes, psub, k)  # native C++ when built
        return time.perf_counter() - t0

    def t_numpy():
        t0 = time.perf_counter()
        np.minimum(
            hv._chunked(lambda p: hv._pack_u64(
                hv._gather_windows(codes, p, k), 2), psub),
            hv._chunked(lambda p: hv._pack_u64(
                (hv._gather_windows(codes, p, k) ^ np.uint8(2))[:, ::-1], 2),
                psub))
        return time.perf_counter() - t0

    t_native(); t_numpy()  # warm (page in codes, allocator)
    ns_host_native = med(t_native, args.repeats) / hm * 1e9
    ns_host_numpy = med(t_numpy, args.repeats) / hm * 1e9

    ns_dev = t_dev / m * 1e9
    print(json.dumps({
        "metric": "device_values_ns_per_value",
        "n_bp": n,
        "positions": m,
        "value": round(ns_dev, 3),
        "unit": "ns/value",
        "device_s": round(t_dev, 4),
        "host_native_ns_per_value": round(ns_host_native, 2),
        "host_numpy_ns_per_value": round(ns_host_numpy, 2),
        "host_sample_m": hm,
        "speedup_vs_host_native": round(ns_host_native / ns_dev, 2),
        "note": ("device path excludes result download (~8 B/value); "
                 "through a slow link host-native extraction wins, on a "
                 "PCIe host the device path keeps values device-resident "
                 "for downstream device consumers"),
    }))


if __name__ == "__main__":
    main()
