"""One-off extended randomized differential fuzz: fused interpret vs oracle.

Random (k, w, n, mode, hasher, canonical, skip-amb, compact) configs through
the fused kernel in interpret mode, compared bit-exactly against the NumPy
oracle. Run while the chip is down; catches logic corners the fixed test
grid might miss. Not committed as a test (suite time budget).
"""
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

from simd_minimizers_tpu.hashers import AntiLexHasher, MulHasher, NtHasher
from simd_minimizers_tpu.ops import oracle, pipeline
from simd_minimizers_tpu.ops.fused import fused_sketch

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
N_CFG = int(sys.argv[2]) if len(sys.argv) > 2 else 60
t0 = time.time()
for i in range(N_CFG):
    k = int(rng.integers(1, 65))
    # ~1 in 8 configs drive the large-w row-striped halo (l - 1 > TAIL)
    w = (int(rng.integers(1, 40)) if rng.random() < 0.875
         else int(rng.integers(1025, 2600)))
    l = k + w - 1
    canonical = bool(rng.integers(0, 2)) and l % 2 == 1
    mode = rng.choice(["minimizers", "minimizers", "superkmers",
                       "closed_syncmers", "open_syncmers"])
    if mode == "open_syncmers" and w % 2 == 0:
        w += 1
        l += 1
        canonical = canonical and l % 2 == 1
    hcls = rng.choice([NtHasher, MulHasher, AntiLexHasher])
    h = hcls(k, canonical=canonical)
    n = int(rng.integers(l, 60000))
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    amb_on = bool(rng.integers(0, 2)) and mode not in ("superkmers",)
    if amb_on and rng.integers(0, 2):
        # clustered Ns: most blocks clean -> drives the per-block amb
        # gate's skip branch and mixed-block seams
        amb = np.zeros(n, np.uint8)
        start = int(rng.integers(0, n))
        amb[start : start + int(rng.integers(1, 200))] = 1
    elif amb_on:
        amb = (rng.random(n) < 0.02).astype(np.uint8)
    else:
        amb = None
    # 8192 is the production default (DEF_C): the rowplace bit packing
    # (VBITS/SBITS) and the MXU rank limb ranges depend on C, so the
    # fuzz must cover it, not just the fast small geometries
    C = int(rng.choice([1024, 2048, 4096, 8192]))
    G = int(rng.integers(1, 3)) * (-(-max(n - l + 1, 1) // (8 * C)))
    # every 6th config routes through the cross-record pipeline instead
    # (the same kernel, but spans + seam merges across record boundaries)
    via_records = i % 6 == 5
    compact = None
    cfg = [i, k, w, mode, hcls.__name__, canonical, amb_on, C, G,
           "rec" if via_records else "one"]
    try:
        if via_records:
            from simd_minimizers_tpu.ops.fused import sketch_records

            got = sketch_records(
                [codes], k, w, h, mode=mode,
                ambiguous=[amb], C=C, interpret=True,
                span_chars=max(int(rng.integers(l + 1, max(n, l + 2) + 1)),
                               2 * l))[0]
        else:
            compact = None if rng.random() < 0.7 else "rowf32"
            cfg.append(compact or "def")
            got = fused_sketch(codes, k, w, h, mode=mode, ambiguous_np=amb,
                               C=C, G=G, interpret=True, compact=compact)
        sel = oracle.selected_stream(codes, k, w, h, ambiguous=amb)
        if mode == "superkmers":
            want = oracle.collect_and_dedup_with_index(sel)
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])
        elif mode.endswith("syncmers"):
            want = oracle.collect_syncmers(sel, w, mode == "open_syncmers")
            np.testing.assert_array_equal(got, want)
        else:
            want = oracle.collect_and_dedup(sel, skip_sentinel=amb_on)
            np.testing.assert_array_equal(got, want)
    except Exception as e:
        print("FAIL", cfg, repr(e)[:500], flush=True)
        raise
    print(f"ok {cfg} [{time.time()-t0:.0f}s]", flush=True)
print("ALL OK", N_CFG, "configs", flush=True)
