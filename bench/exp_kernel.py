"""Kernel-variant experiment: one config per process (dev tool).

Usage: python bench/exp_kernel.py [--rb 8] [--c 4096] [--ablate none]
       [--n 100000000] [--k 21] [--w 11] [--fwd]

RB is a module constant read at trace time, so each RB variant must run
in a fresh process (the jit cache key does not include it). Prints one
JSON line with the measured ns/bp.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rb", type=int, default=8)
    ap.add_argument("--c", type=int, default=4096)
    ap.add_argument("--ablate", default="none",
                    choices=["none", "decode", "hash", "minl", "blend",
                             "sel", "rank", "bfly", "pack"])
    ap.add_argument("--n", type=int, default=10**8)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--w", type=int, default=11)
    ap.add_argument("--fwd", action="store_true")
    ap.add_argument("--input", default="striped2",
                    choices=["striped2", "striped2r"])
    ap.add_argument("--compact", default=None,  # None = fused.DEF_COMPACT
                    choices=["flat", "rowplace", "rowplace4", "rowsign",
                             "rowmxu", "rowsignmxu", "rowmxu2", "rowmxu3",
                             "rowf32", "rowmxu4"])
    ap.add_argument("--hashimpl", default=None, choices=["var", "rel"],
                    help="hash-fold implementation (None = fused.HASH_IMPL); "
                         "module-level like --rb, one variant per process")
    ap.add_argument("--mode", default="minimizers",
                    choices=["minimizers", "superkmers", "closed_syncmers",
                             "open_syncmers"])
    ap.add_argument("--skip-amb", action="store_true",
                    help="run in skip-ambiguous mode (random N mask, see "
                         "--amb-frac) to measure the ambiguity-plane "
                         "overhead the batch path pays")
    ap.add_argument("--amb-frac", type=float, default=0.01,
                    help="fraction of ambiguous chars for --skip-amb. 0 "
                         "measures the feature-on/data-clean case (every "
                         "block takes the gated skip branch); uniform "
                         "fractions >~1e-4 make every 64Kbp block "
                         "ambiguous, the worst case for the per-block "
                         "gate. Clustered Ns (--amb-cluster) model the "
                         "real-genome shape: one contiguous N run, most "
                         "blocks clean.")
    ap.add_argument("--amb-cluster", action="store_true",
                    help="place the --amb-frac mass as ONE contiguous run "
                         "in the middle of the input instead of uniform "
                         "random positions")
    ap.add_argument("--verify", action="store_true",
                    help="check bit-exactness vs the NumPy oracle on the "
                         "first run (use a small --n; the oracle is host-side)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret mode (correctness only; timings "
                         "are meaningless)")
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from simd_minimizers_tpu import cache_dir

    jax.config.update("jax_compilation_cache_dir", cache_dir("jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from simd_minimizers_tpu import native
    from simd_minimizers_tpu.hashers import NtHasher
    from simd_minimizers_tpu.ops import fused as F
    from simd_minimizers_tpu.ops.pipeline import hasher_jit_args

    assert args.rb == 8 or args.input != "striped2r", \
        "the native row-striped packer hardcodes 8 rows/block"
    F.RB = args.rb  # before any trace
    if args.hashimpl:
        F.HASH_IMPL = args.hashimpl
    k, w, n, C = args.k, args.w, args.n, args.c
    l = k + w - 1
    BC = F.RB * C
    nw = n - l + 1
    G = -(-nw // BC)
    rng = np.random.default_rng(0xBEEF)
    PADH = F.padh_for(k + w - 1)
    need = max(G * BC + F.TAIL, F.rowstriped_need_chars(G, C, PADH))
    codes = np.zeros(need, np.uint8)
    codes[:n] = rng.integers(0, 4, n, dtype=np.uint8)
    h = NtHasher(k, canonical=not args.fwd)
    key, table, mul_const = hasher_jit_args(h)
    ablate = None if args.ablate == "none" else args.ablate
    kw = dict(k=k, w=w, mode=args.mode, skip_ambiguous=args.skip_amb,
              hasher_key=key, C=C, G=G, input_mode=args.input, ablate=ablate,
              compact=args.compact, interpret=args.interpret)
    words = (F.pack_rowstriped(codes, G, C, PADH) if args.input == "striped2r"
             else native.pack_2bit_striped(codes, G, BC, *F.striped_geometry(C)[1:]))
    if args.skip_amb:
        assert args.input == "striped2r", "--skip-amb measures the batch wire format"
        # same unrepresentability rule as the public API (reference
        # lib.rs:498-503); the oracle comparison below would also disagree
        # with the kernel's SKIPPED-drop for the index plane
        assert args.mode != "superkmers", "--skip-amb x superkmers is unsupported"
        amb = np.zeros(need, np.uint8)
        if args.amb_cluster:
            run = int(n * args.amb_frac)
            amb[n // 2 : n // 2 + run] = 1
        else:
            amb[:n] = rng.random(n) < args.amb_frac
        amb_words = jnp.asarray(F.pack_rowstriped(amb, G, C, PADH))
    else:
        amb_words = jnp.zeros(F.TAIL, jnp.uint32)
    call_args = (
        jnp.asarray(words),
        amb_words,
        jnp.asarray([nw, 0], np.int32),
        jnp.asarray(table),
        jnp.asarray([mul_const], np.uint32),
    )
    jax.block_until_ready(call_args)
    t0 = time.perf_counter()
    out = F._fused_call(*call_args, **kw)
    int(out[2][0])
    compile_s = time.perf_counter() - t0

    verified = None
    if args.verify:
        assert ablate is None, "--verify needs the full (non-ablated) kernel"
        from simd_minimizers_tpu.ops import oracle
        from simd_minimizers_tpu.ops.pipeline import MODE_OPEN_SYNCMERS

        cnt = int(out[2][0])
        sel = oracle.selected_stream(
            codes[:n], k, w, h,
            ambiguous=amb[:n] if args.skip_amb else None)
        if args.mode == "superkmers":
            want_pos, want_idx = oracle.collect_and_dedup_with_index(sel)
            np.testing.assert_array_equal(np.asarray(out[0][:cnt]), want_pos)
            np.testing.assert_array_equal(np.asarray(out[1][:cnt]), want_idx)
        elif args.mode.endswith("syncmers"):
            want = oracle.collect_syncmers(
                sel, w, args.mode == MODE_OPEN_SYNCMERS)
            np.testing.assert_array_equal(np.asarray(out[0][:cnt]), want)
        else:
            want = oracle.collect_and_dedup(sel, skip_sentinel=args.skip_amb)
            np.testing.assert_array_equal(np.asarray(out[0][:cnt]), want)
        verified = True

    def batch(m):
        t = time.perf_counter()
        for _ in range(m):
            r = F._fused_call(*call_args, **kw)
        int(r[2][0])
        return time.perf_counter() - t

    batch(1)
    t_one = min(batch(1) for _ in range(3))
    t_many = min(batch(6) for _ in range(3))
    per_run = (t_many - t_one) / 5
    ns = per_run * 1e9 / n
    print(json.dumps({"rb": args.rb, "C": C, "input": args.input,
                      "mode": args.mode,
                      "ablate": args.ablate,
                      "compact": args.compact or F.DEF_COMPACT,
                      "hashimpl": F.HASH_IMPL,
                      "k": k, "w": w, "canonical": not args.fwd,
                      "skip_amb": args.skip_amb,
                      "ns_per_bp": round(ns, 4),
                      "compile_s": round(compile_s, 1),
                      **({"verified": verified} if verified else {})}))


if __name__ == "__main__":
    main()
