"""Persistent pre-compiled sketcher for latency-sensitive short sequences.

The streaming kernel's per-call floor for short inputs is dispatch
overhead, not compute (at len 8192 the kernel's device work is ~5 us
while a cold jit dispatch costs 100+ us, and the dev tunnel adds ~30 ms
per synchronized round trip). The reference's short-sequence numbers
(8 KiB in ~23 us on one CPU core, /root/reference/bench/src/bin/paper.rs:
61-115) are only approachable on TPU by removing every per-call host
cost. This class does that:

- ONE ahead-of-time compiled program per (k, w, hasher, mode) with a
  small fixed geometry (G=1, C=1024 by default: up to 8192 windows), so
  calls skip jit tracing and cache lookup entirely;
- pre-staged constant operands (hash table, mul const, ambiguity stub);
- an async `launch`/`harvest` split so many short sequences can be
  enqueued back-to-back with ONE synchronization (the amortized
  per-call time is the true on-chip floor, measured by
  `measure_floor`);
- `donate=True` donates the input words buffer to XLA so steady-state
  calls reuse the same device allocation.

This is an explicit opt-in API rather than an automatic route in
`backend.sketch`: the first call per (k, w) config pays a full Mosaic
compile (~minutes through the dev tunnel, seconds on a TPU VM), which
would be a surprising stall on a generic path, and the big-kernel
per-call floor is already dispatch-bound (round-2 A/B: a small-block
variant dispatched through the normal path LOST to the C=4096 kernel at
len 1024, 200 vs 153 us/call). Construct one sketcher per config up
front, then feed it sequences.
"""

from __future__ import annotations

import functools

import numpy as np

from ..hashers import KmerHasher
from .pipeline import MODE_MINIMIZERS, MODE_SUPERKMERS, hasher_jit_args


class ShortSeqSketcher:
    """Pre-compiled fixed-geometry fused-kernel program for short inputs."""

    def __init__(self, k: int, w: int, hasher: KmerHasher,
                 mode: str = MODE_MINIMIZERS, C: int = 1024,
                 interpret: bool = False, donate: bool = True):
        import jax
        import jax.numpy as jnp

        from . import fused as F

        self.k, self.w, self.mode = k, w, mode
        l = k + w - 1
        self._l = l
        self._C = C
        self._BC = F.RB * C
        self.max_chars = self._BC + l - 1  # G=1: one block of windows
        self._PADH = F.padh_for(l)
        _, _, SPW_PAD = F.rowstriped_geometry(C, self._PADH)
        self._need = F.rowstriped_need_chars(1, C, self._PADH)
        key, table, mul_const = hasher_jit_args(hasher)
        self._tab = jnp.asarray(table)
        self._mc = jnp.asarray([mul_const], np.uint32)
        self._amb = jnp.zeros(F.TAIL, jnp.uint32)
        fn = functools.partial(
            F._invoke_pallas, k=k, w=w, mode=mode, skip_ambiguous=False,
            hasher_key=key, C=C, G=1, interpret=interpret,
            input_mode="striped2r")
        self._donate = donate
        jitted = jax.jit(fn, donate_argnums=(0,) if donate else ())
        words0 = jnp.zeros((F.RB, SPW_PAD), jnp.uint32)
        nw0 = jnp.asarray([1, 0], np.int32)
        # AOT compile once; calls skip tracing + jit cache lookup
        self._compiled = jitted.lower(
            words0, self._amb, nw0, self._tab, self._mc).compile()
        self._pack = F.pack_rowstriped

    # -- async pipeline -----------------------------------------------------
    def launch(self, codes_np: np.ndarray, offset: int = 0):
        """Enqueue one sketch; returns device handles (no sync)."""
        import jax.numpy as jnp

        n = int(codes_np.shape[0])
        assert n <= self.max_chars, (
            f"ShortSeqSketcher(C={self._C}) handles up to {self.max_chars} "
            f"chars; route longer inputs through backend.sketch")
        if n < self._l:
            return None
        buf = np.zeros(self._need, np.uint8)
        buf[:n] = codes_np
        words = jnp.asarray(self._pack(buf, 1, self._C, self._PADH))
        off_bits = np.asarray([np.uint32(offset)], np.uint32).view(np.int32)[0]
        nw = jnp.asarray([n - self._l + 1, off_bits], np.int32)
        return self._compiled(words, self._amb, nw, self._tab, self._mc)

    def harvest(self, handles):
        """Materialize one launch's positions (the only sync point)."""
        empty = np.zeros(0, np.uint32)
        if handles is None:
            return (empty, empty) if self.mode == MODE_SUPERKMERS else empty
        out, idx, count = handles
        cnt = int(count[0])
        if self.mode == MODE_SUPERKMERS:
            return (np.asarray(out[: max(cnt, 1)][:cnt]),
                    np.asarray(idx[: max(cnt, 1)][:cnt]))
        return np.asarray(out[: max(cnt, 1)][:cnt])

    # -- one-shot -----------------------------------------------------------
    def sketch(self, codes_np: np.ndarray):
        """Pack + run + return positions for one short sequence."""
        return self.harvest(self.launch(codes_np))

    def sketch_many(self, seqs):
        """Sketch a list of short sequences with pipelined dispatch:
        launch i+1 before harvesting i (one extra call in flight)."""
        outs = []
        pending = []
        for s in seqs:
            pending.append(self.launch(s))
            if len(pending) > 1:
                outs.append(self.harvest(pending.pop(0)))
        while pending:
            outs.append(self.harvest(pending.pop(0)))
        return outs

    # -- measurement --------------------------------------------------------
    def measure_floor(self, codes_np: np.ndarray, m: int = 50,
                      probes: int = 3) -> dict:
        """On-chip per-call floor, three numbers:

        - sync_us: one synchronized call (pack + transfer + compute +
          host round trip) — tunnel-bound in this environment;
        - per_call_us: m launches enqueued back-to-back, one sync —
          cancels the sync latency but still pays a per-call host->device
          input transfer;
        - device_floor_us: the same compiled program re-invoked m times
          on a PRE-STAGED device input (requires donate=False) — pure
          dispatch + device compute, the true on-chip floor.
        """
        import time

        import jax.numpy as jnp

        assert m > 1, "m > 1: per_call_us is a (t_many - t_one)/(m-1) slope"
        assert codes_np.shape[0] >= self._l, (
            f"input shorter than one window (l={self._l}): nothing to time")
        self.harvest(self.launch(codes_np))  # warm

        def batch(mm):
            t0 = time.perf_counter()
            h = None
            for _ in range(mm):
                h = self.launch(codes_np)
            int(h[2][0])
            return time.perf_counter() - t0

        t_one = min(batch(1) for _ in range(probes))
        t_many = min(batch(m) for _ in range(probes))
        res = {
            "per_call_us": round((t_many - t_one) / (m - 1) * 1e6, 1),
            "sync_us": round(t_one * 1e6, 1),
        }
        if not self._donate:
            n = int(codes_np.shape[0])
            buf = np.zeros(self._need, np.uint8)
            buf[:n] = codes_np
            words = jnp.asarray(self._pack(buf, 1, self._C, self._PADH))
            nw = jnp.asarray([n - self._l + 1, 0], np.int32)

            def batch_dev(mm):
                t0 = time.perf_counter()
                h = None
                for _ in range(mm):
                    h = self._compiled(words, self._amb, nw, self._tab,
                                       self._mc)
                int(h[2][0])
                return time.perf_counter() - t0

            batch_dev(1)
            td_one = min(batch_dev(1) for _ in range(probes))
            td_many = min(batch_dev(m) for _ in range(probes))
            res["device_floor_us"] = round(
                (td_many - td_one) / (m - 1) * 1e6, 1)
        return res
