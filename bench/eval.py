"""Render tables from bench/paper.py results (the reference's bench/eval.py).

Usage: python bench/eval.py [results.json]
"""

from __future__ import annotations

import json
import os
import sys

REF_AVX2 = {  # reference bench/results.json (BASELINE.md)
    (5, 31, False): 1.69, (5, 31, True): 2.28,
    (11, 21, False): 1.61, (11, 21, True): 2.20,
    (19, 19, False): 1.64, (19, 19, True): 2.16,
}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "results.json")
    with open(path) as f:
        res = json.load(f)
    print(f"device: {res.get('device')}   n = {res.get('n'):,} bp\n")

    if "external" in res:
        print("== external: fused kernel ns/bp (vs reference AVX2 ntHash) ==")
        print(f"{'w':>3} {'k':>3} {'strand':>9} {'hasher':>6} {'ns/bp':>8} "
              f"{'ref':>6} {'speedup':>8}")
        for r in res["external"]:
            ref = REF_AVX2.get((r["w"], r["k"], r["canonical"]))
            ref_s = f"{ref:.2f}" if r["hasher"] == "nt" and ref else "-"
            sp = f"{ref / r['ns_per_bp']:.1f}x" if r["hasher"] == "nt" and ref else "-"
            strand = "canonical" if r["canonical"] else "fwd"
            print(f"{r['w']:>3} {r['k']:>3} {strand:>9} {r['hasher']:>6} "
                  f"{r['ns_per_bp']:>8.4f} {ref_s:>6} {sp:>8}")
        print()

    if "incremental" in res:
        print("== incremental: cumulative stage cost, XLA pipeline ==")
        prev = 0.0
        for r in res["incremental"]:
            delta = r["ns_per_bp"] - prev if r["backend"] == "xla" else None
            d = f" (+{delta:.3f})" if delta is not None and prev else ""
            print(f"  {r['stage']:>14}: {r['ns_per_bp']:.4f} ns/bp{d}")
            if r["backend"] == "xla":
                prev = r["ns_per_bp"]
        print()

    if "short" in res:
        print("== short sequences: per-call latency (single seq) ==")
        for r in res["short"]:
            print(f"  len {r['len']:>8}: {r['us_per_seq']:>9.1f} us/seq "
                  f"({r['ns_per_bp']:.2f} ns/bp)")
        print()

    if "batch" in res:
        print("== batched short reads (one kernel launch, device-resident) ==")
        for r in res["batch"]:
            print(f"  {r['reads']:>7} x {r['len']:>5}bp: {r['ns_per_bp']:.4f} ns/bp "
                  f"({r['reads_per_s']/1e6:.2f} M reads/s)")
        print()

    if "sliding_min_comparisons" in res:
        print("== sliding-min comparisons/element (algorithm zoo) ==")
        for k, v in res["sliding_min_comparisons"].items():
            print(f"  {k:>8}: {v:.2f}")
        print()

    if "human_genome" in res:
        h = res["human_genome"]
        print(f"human genome ({h['source']}, {h['n']/1e9:.2f} Gbp): "
              f"{h['count']:,} minimizers, density {h['density']}")
        print(f"  wall {h['wall_s']}s (tunnel-bound; device ~{h.get('device_s_est','?')}s "
              f"at measured ns/bp)\n")

    if "density" in res:
        d = res["density"]
        print(f"density: {d['density']} (expected ~{d['expected']})")


if __name__ == "__main__":
    main()
