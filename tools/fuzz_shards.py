"""One-off randomized fuzz of the shard/multihost seam machinery vs oracle.

Round 2's one verified bug lived in the multihost layer, so this tool
hammers exactly that: random (k, w, n, mode, hasher, shards) configs
through local_shard_sketch + the mode-aware merge, with adversarial
inputs — low-entropy sequences (massive tie runs crossing seams) and
ambiguous bases clustered AT the shard boundaries (the seam re-evaluation
must drop SKIPPED runs exactly like the oracle).

Usage: python tools/fuzz_shards.py [seed] [n_configs]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

from simd_minimizers_tpu.hashers import AntiLexHasher, MulHasher, NtHasher
from simd_minimizers_tpu.ops import oracle
from simd_minimizers_tpu.parallel import multihost

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
N_CFG = int(sys.argv[2]) if len(sys.argv) > 2 else 80
t0 = time.time()
fails = 0

for i in range(N_CFG):
    k = int(rng.integers(1, 40))
    w = int(rng.integers(1, 25))
    mode = str(rng.choice(["minimizers", "minimizers", "superkmers",
                           "closed_syncmers", "open_syncmers"]))
    if mode == "open_syncmers" and w % 2 == 0:
        mode = "closed_syncmers"
    hcls = rng.choice([NtHasher, NtHasher, MulHasher, AntiLexHasher])
    seed = int(rng.integers(0, 3)) or None
    if hcls is AntiLexHasher:
        k = min(k, 32)
        seed = None
    l = k + w - 1  # after any k clamp: canonical needs l odd
    canonical = bool(rng.integers(0, 2)) and l % 2 == 1
    h = hcls(k, canonical=canonical, seed=seed)
    S = int(rng.integers(1, 10))
    n = int(rng.integers(max(l + 1, 50), 20000))
    # adversarial alphabet: sometimes 1 or 2 symbols -> huge tie runs
    alpha = int(rng.choice([1, 2, 4, 4]))
    codes = rng.integers(0, alpha, n, dtype=np.uint8)
    amb = None
    if mode == "minimizers" and canonical and rng.integers(0, 2):
        amb = np.zeros(n, np.uint8)
        # clusters of Ns right at the seam boundaries + a few random ones
        for s_id in range(1, S):
            s, e = multihost.shard_bounds(n, l, S, s_id)
            if e > s:
                c0 = max(0, s - int(rng.integers(0, l + 2)))
                amb[c0: min(n, c0 + int(rng.integers(1, 2 * l)))] = 1
        amb |= (rng.random(n) < 0.002).astype(np.uint8)

    parts, starts = [], []
    for s_id in range(S):
        parts.append(multihost.local_shard_sketch(
            codes, k, w, h, S, s_id, mode=mode, ambiguous_np=amb))
        starts.append(multihost.shard_bounds(n, l, S, s_id)[0])
    if mode == "superkmers":
        got = multihost._merge_mode_shards(
            [p[0] for p in parts], starts, codes, k, w, h, mode, amb,
            aux=[p[1] for p in parts])
    else:
        got = multihost._merge_mode_shards(
            parts, starts, codes, k, w, h, mode, amb)

    sel = oracle.selected_stream(codes, k, w, h, ambiguous=amb)
    cfg = (i, k, w, n, S, mode, hcls.__name__, canonical, alpha,
           amb is not None)
    if mode == "superkmers":
        want = oracle.collect_and_dedup_with_index(sel)
        ok = (np.array_equal(got[0], want[0])
              and np.array_equal(got[1], want[1]))
    elif mode.endswith("syncmers"):
        want = oracle.collect_syncmers(sel, w, mode == "open_syncmers")
        ok = np.array_equal(got, want)
    else:
        want = oracle.collect_and_dedup(sel, skip_sentinel=amb is not None)
        ok = np.array_equal(got, want)
    print(("ok " if ok else "FAIL ") + str(cfg) + f" [{time.time()-t0:.0f}s]",
          flush=True)
    if not ok:
        fails += 1

print(f"done: {N_CFG - fails}/{N_CFG} ok")
sys.exit(1 if fails else 0)
