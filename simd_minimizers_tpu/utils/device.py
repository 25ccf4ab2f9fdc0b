"""Device acquisition with a watchdog.

The TPU attach path can hang indefinitely when the transport between the
host and the chip wedges (observed on tunneled single-chip setups: the
backend registers but the device claim never answers). Acquiring through
a daemon thread turns that into a diagnosable TimeoutError instead of a
silent hang, so CLIs and benches can fail fast.
"""

from __future__ import annotations

import queue
import sys
import threading


def acquire_devices(timeout_s: float = 900.0):
    """``jax.devices()``, or raise TimeoutError after ``timeout_s``.

    On timeout the claiming thread is left behind as a daemon (there is
    no safe way to cancel a stuck PJRT claim); callers should exit.
    """
    q: "queue.Queue" = queue.Queue()

    def work():
        try:
            import jax

            q.put(("ok", jax.devices()))
        except Exception as e:  # pragma: no cover - environment-dependent
            q.put(("err", e))

    threading.Thread(target=work, daemon=True).start()
    try:
        kind, val = q.get(timeout=timeout_s)
    except queue.Empty:
        raise TimeoutError(
            f"device acquisition did not answer within {timeout_s:.0f}s "
            "(transport wedged?)"
        ) from None
    if kind == "err":
        raise val
    return val


def acquire_devices_or_exit(timeout_s: float = 900.0, code: int = 3):
    """CLI helper: acquire_devices, printing + hard-exiting on timeout."""
    try:
        return acquire_devices(timeout_s)
    except TimeoutError as e:
        print(f"FATAL: {e}; aborting", file=sys.stderr)
        import os

        os._exit(code)
