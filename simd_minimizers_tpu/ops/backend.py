"""Backend dispatch: fused Pallas kernel on TPU, XLA pipeline elsewhere.

The two backends are bit-identical (enforced by tests/test_fused.py and
tests/test_pipeline_vs_oracle.py); the fused kernel is ~4x faster on TPU
(0.30 vs 1.1 ns/bp canonical k=21 w=11 on v5e).
"""

from __future__ import annotations

import functools

import numpy as np

from ..hashers import KmerHasher
from . import pipeline

# beyond this many windows, the non-TPU path streams fixed-geometry chunks
# (ops/chunked.py) instead of building one giant lane matrix
PIPELINE_CHUNK_WINDOWS = 1 << 24


@functools.cache
def _use_fused() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _bucket_G(G: int) -> int:
    """Round the grid size up to a power of two to bound recompiles.

    Dead blocks are skipped at runtime by the kernel's active-block gating,
    so over-provisioning costs a few SMEM compares per dead block.
    """
    return 1 << (G - 1).bit_length() if G > 1 else 1


def sketch(
    codes_np: np.ndarray,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = pipeline.MODE_MINIMIZERS,
    ambiguous_np: np.ndarray | None = None,
    dna: bool | None = None,
):
    """Positions (or (positions, superkmer indices)) via the best backend.

    `dna` tells the fused path whether codes are 2-bit DNA (threaded from
    the seq type by the public API so no hot path scans the input on host;
    None falls back to a probe)."""
    n = int(codes_np.shape[0])
    l = k + w - 1
    # parameter validity is path-independent (the chunked fallback calls
    # run_chunk directly, which does not re-check)
    if mode == pipeline.MODE_OPEN_SYNCMERS:
        assert w % 2 == 1, "open syncmers require odd w"
    if hasher.canonical:
        assert l % 2 == 1, (
            f"window length l={l} must be odd to determine strand"
        )
    if _use_fused():
        from . import fused

        # geometry outside the fused kernel's bounds (huge halo or
        # packed-min columns, fused.fused_supported) falls through to the
        # XLA pipeline below — it runs on TPU too: slower, never wrong
        if fused.fused_supported(k, w):
            if n >= (1 << 30):
                return fused.sketch_long(
                    codes_np, k, w, hasher, mode=mode,
                    ambiguous_np=ambiguous_np, dna=dna,
                )
            nw = max(n - l + 1, 1)
            # one geometry for all sizes: measured A/B shows the big-C
            # kernel beats a C=1024 small-block variant even at len 1024
            # (153 vs 200 us/call) — the per-call floor is launch
            # overhead, not block compute, so the extra compile variant
            # bought nothing.
            C = fused.DEF_C
            G = _bucket_G(-(-nw // (fused.RB * C)))
            return fused.fused_sketch(
                codes_np, k, w, hasher, mode=mode, ambiguous_np=ambiguous_np,
                C=C, G=G, dna=dna,
            )
    if n >= l and (n - l + 1) > PIPELINE_CHUNK_WINDOWS:
        from . import chunked

        return chunked.sketch(
            codes_np, k, w, hasher, mode=mode, ambiguous_np=ambiguous_np,
            chunk_windows=PIPELINE_CHUNK_WINDOWS,
        )
    return pipeline.run_pipeline(
        codes_np, k, w, hasher, mode=mode, ambiguous_np=ambiguous_np
    )


def sketch_records(
    records,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = pipeline.MODE_MINIMIZERS,
    ambiguous=None,
    dna: bool | None = None,
):
    """Sketch many independent sequences; list of per-record results.

    On TPU the fused launches are pipelined depth-2 ACROSS records
    (fused.sketch_records), so a multi-record genome hides pack+transfer
    behind device compute instead of synchronizing once per record.
    Elsewhere it is a plain per-record loop. Bit-identical to calling
    sketch() on each record.
    """
    l = k + w - 1
    pipeline.assert_no_superkmer_ambiguity(
        mode, ambiguous is not None and any(a is not None for a in ambiguous))
    if mode == pipeline.MODE_OPEN_SYNCMERS:
        assert w % 2 == 1, "open syncmers require odd w"
    if hasher.canonical:
        assert l % 2 == 1, (
            f"window length l={l} must be odd to determine strand"
        )
    from . import fused

    if _use_fused() and fused.fused_supported(k, w):
        return fused.sketch_records(
            records, k, w, hasher, mode=mode, ambiguous=ambiguous, dna=dna
        )
    amb = list(ambiguous) if ambiguous is not None else [None] * len(records)
    assert len(amb) == len(records), "ambiguous must align with records"
    return [
        sketch(c, k, w, hasher, mode=mode, ambiguous_np=amb[i], dna=dna)
        for i, c in enumerate(records)
    ]


def sketch_batch(
    reads,
    k: int,
    w: int,
    hasher: KmerHasher,
    mode: str = pipeline.MODE_MINIMIZERS,
    ambiguous=None,
    C: int | None = None,
    dna: bool | None = None,
):
    """Batched reads: (read_ids, positions[, superkmer indices]).

    All reads of a stride bucket go through ONE launch (fused Pallas kernel
    on TPU for 2-bit DNA codes, the XLA pipeline elsewhere / for general
    text); see ops/batch.py. Results are ordered by read and bit-identical
    to sketching each read alone.
    """
    from . import batch

    return batch.sketch_batch(
        reads, k, w, hasher, mode=mode, ambiguous=ambiguous, C=C, dna=dna
    )
