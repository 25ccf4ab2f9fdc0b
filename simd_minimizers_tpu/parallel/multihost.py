"""Multi-host sketching: each host sketches its genome shard; results merge
bit-exactly (SURVEY.md §2.4, BASELINE config 5).

Scheme (the pod-scale generalization of the reference's 8-lane split and
cross-lane seam dedup, /root/reference/src/collect.rs:252-272):

1. The genome is split into contiguous host shards overlapping by l-1
   chars (so every window is owned by exactly one host).
2. Each host runs the sharded device sketch on its local mesh with its
   global char offset — positions come out sequence-global.
3. Per-host (positions, count) ragged buffers are all-gathered over DCN
   (`process_allgather`) or collected by the caller; `merge_shard_positions`
   concatenates and deduplicates at shard seams (adjacent shards emit the
   same minimizer only when it sits in the halo).

Single-process fallbacks make every function testable on one host.
"""

from __future__ import annotations

import numpy as np

from ..hashers import KmerHasher
from ..ops import pipeline
from . import shard


def shard_bounds(n: int, l: int, num_shards: int, shard_id: int) -> tuple[int, int]:
    """Char span [start, end) of a shard incl. the l-1 halo at the end."""
    nw = max(n - l + 1, 0)
    per = -(-nw // num_shards) if nw else 0
    s = min(shard_id * per, nw)
    e = min(s + per, nw)
    if s >= e:
        return 0, 0
    return s, min(e - 1 + l, n)


def merge_shard_positions(shards: list[np.ndarray]) -> np.ndarray:
    """Concatenate per-shard global position lists, dedup at the seams."""
    parts = [s for s in shards if s.size]
    if not parts:
        return np.zeros(0, np.uint32)
    out = [parts[0]]
    for nxt in parts[1:]:
        prev_last = out[-1][-1]
        out.append(nxt[1:] if nxt[0] == prev_last else nxt)
    return np.concatenate(out)


def local_shard_sketch(
    codes_np: np.ndarray,
    k: int,
    w: int,
    hasher: KmerHasher,
    num_shards: int,
    shard_id: int,
    mode: str = pipeline.MODE_MINIMIZERS,
    mesh=None,
) -> np.ndarray:
    """This host's contribution: sketch its halo'd shard, global positions."""
    l = k + w - 1
    n = int(codes_np.shape[0])
    s, e = shard_bounds(n, l, num_shards, shard_id)
    if e <= s:
        return np.zeros(0, np.uint32)
    local = codes_np[s:e]
    from ..ops import backend

    mesh = mesh or shard.default_mesh(local_only=True)
    if backend._use_fused() and mode == pipeline.MODE_MINIMIZERS:
        pos = shard.fused_sharded_sketch(local, k, w, hasher, mode=mode, mesh=mesh)
    else:
        pos = shard.sharded_sketch(local, k, w, hasher, mode=mode, mesh=mesh)
    return (pos + np.uint32(s)).astype(np.uint32)


def multihost_sketch(
    codes_np: np.ndarray,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = pipeline.MODE_MINIMIZERS,
) -> np.ndarray:
    """Whole-genome sketch across all JAX processes.

    Call identically on every host (after jax.distributed.initialize);
    each host sketches its shard on its local devices, shards all-gather
    over DCN, and every host returns the identical global position list.
    On a single process this degrades to the local sharded sketch.
    """
    import jax

    nproc = jax.process_count()
    pid = jax.process_index()
    mine = local_shard_sketch(codes_np, k, w, hasher, nproc, pid, mode=mode)
    if nproc == 1:
        return mine
    from jax.experimental import multihost_utils

    # ragged all-gather: pad to the max count, exchange (buffer, count)
    cap = int(
        multihost_utils.process_allgather(np.asarray([mine.size], np.int64)).max()
    )
    buf = np.full(cap, 0xFFFFFFFF, np.uint32)
    buf[: mine.size] = mine
    all_bufs = multihost_utils.process_allgather(buf)  # (nproc, cap)
    all_cnts = multihost_utils.process_allgather(np.asarray([mine.size], np.int64))
    shards = [all_bufs[p, : int(all_cnts[p, 0])] for p in range(nproc)]
    return merge_shard_positions(shards)
