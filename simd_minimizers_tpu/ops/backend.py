"""Backend dispatch: fused Pallas kernel on TPU, XLA pipeline elsewhere.

The two backends are bit-identical (enforced by tests/test_fused.py and
tests/test_pipeline_vs_oracle.py); the fused kernel is ~4x faster on TPU
(0.31 vs 1.16 ns/bp canonical k=21 w=11 on v5e).
"""

from __future__ import annotations

import functools

import numpy as np

from ..hashers import KmerHasher
from . import pipeline


@functools.cache
def _use_fused() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _bucket_G(G: int) -> int:
    """Round the grid size up to a power of two to bound recompiles."""
    return 1 << (G - 1).bit_length() if G > 1 else 1


def sketch(
    codes_np: np.ndarray,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = pipeline.MODE_MINIMIZERS,
    ambiguous_np: np.ndarray | None = None,
):
    """Positions (or (positions, superkmer indices)) via the best backend."""
    n = int(codes_np.shape[0])
    if _use_fused():
        from . import fused

        l = k + w - 1
        if n >= l:
            if mode == pipeline.MODE_OPEN_SYNCMERS:
                assert w % 2 == 1, "open syncmers require odd w"
            if hasher.canonical:
                assert l % 2 == 1, (
                    f"window length l={l} must be odd to determine strand"
                )
        if n >= (1 << 30):
            return fused.sketch_long(
                codes_np, k, w, hasher, mode=mode, ambiguous_np=ambiguous_np
            )
        nw = max(n - l + 1, 1)
        G = _bucket_G(-(-nw // (fused.RB * fused.DEF_C)))
        return fused.fused_sketch(
            codes_np, k, w, hasher, mode=mode, ambiguous_np=ambiguous_np, G=G
        )
    return pipeline.run_pipeline(
        codes_np, k, w, hasher, mode=mode, ambiguous_np=ambiguous_np
    )


def sketch_batch(
    reads: list[np.ndarray],
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = pipeline.MODE_MINIMIZERS,
    ambiguous: list[np.ndarray] | None = None,
    C: int = 4096,
):
    """Batched reads: (read_ids, positions[, superkmer indices]).

    On TPU all reads go through ONE fused kernel launch (one read per lane
    row); elsewhere the XLA pipeline runs per read and results are
    concatenated. Both orderings and values are identical.
    """
    is_2bit = all(
        rd.size == 0 or int(np.max(rd)) <= 3
        for rd in (reads if not isinstance(reads, np.ndarray) else [reads.ravel()])
    )
    if _use_fused() and is_2bit:
        # the fused batch path ships 2-bit packed codes; general ASCII
        # text (&[u8] + MulHasher) takes the per-read pipeline below
        from . import fused

        G = _bucket_G(-(-max(len(reads), 1) // fused.RB))
        return fused.batch_sketch(reads, k, w, hasher, mode=mode,
                                  ambiguous=ambiguous, C=C, G=G)
    rids, poss, idxs = [], [], []
    for i, rd in enumerate(reads):
        amb = ambiguous[i] if ambiguous is not None else None
        res = pipeline.run_pipeline(rd, k, w, hasher, mode=mode, ambiguous_np=amb)
        if mode == pipeline.MODE_SUPERKMERS:
            pos, idx = res
            idxs.append(idx)
        else:
            pos = res
        poss.append(pos)
        rids.append(np.full(pos.size, i, np.uint32))
    rid = np.concatenate(rids) if rids else np.zeros(0, np.uint32)
    pos = np.concatenate(poss) if poss else np.zeros(0, np.uint32)
    if mode == pipeline.MODE_SUPERKMERS:
        return rid, pos, np.concatenate(idxs) if idxs else np.zeros(0, np.uint32)
    return rid, pos
