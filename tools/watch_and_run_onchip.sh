#!/bin/bash
# Tunnel watcher: probe until the chip answers, then run the round-3
# on-chip runbook + headline bench. Designed to run unattended in tmux
# while the axon tunnel is wedged (multi-hour outages observed); each
# probe is its own process so a hung claim never blocks the loop (the
# acquire watchdog exits hard on timeout).
set -u
cd "$(dirname "$0")/.."
PROBE_LOG=/tmp/probe_tunnel.log

while true; do
  # acquire_devices_or_exit hard-exits (os._exit) on timeout so the probe
  # is never SIGKILLed mid-claim (CLAUDE.md: killing a claim in flight can
  # wedge the tunnel further); the outer timeout is a last-resort backstop
  if timeout 420 python -c "
from simd_minimizers_tpu.utils.device import acquire_devices_or_exit
devs = acquire_devices_or_exit(timeout_s=300)
assert any(d.platform == 'tpu' for d in devs), devs
import jax.numpy as jnp
assert int(jnp.arange(8).sum()) == 28  # fetch a scalar: proves execution
print('tunnel OK:', devs)
" >"$PROBE_LOG" 2>&1; then
    echo "[watch] tunnel answered at $(date)"
    break
  fi
  # long quiet period between probes: a recovering tunnel should not see
  # a fresh claim every few minutes
  echo "[watch] probe failed at $(date); retry in 900s"
  sleep 900
done

bash tools/onchip_r3.sh 2>&1 | tee /tmp/onchip_r3_run.log
echo "[watch] runbook done at $(date); headline:"
timeout 2400 python bench.py 2>/tmp/bench_headline.err | tee /tmp/bench_headline.json
echo "[watch] all done at $(date)"
