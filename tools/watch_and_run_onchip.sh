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
  if timeout 330 python -c "
from simd_minimizers_tpu.utils.device import acquire_devices
devs = acquire_devices(timeout_s=300)
assert any(d.platform == 'tpu' for d in devs), devs
import jax.numpy as jnp
assert int(jnp.arange(8).sum()) == 28  # fetch a scalar: proves execution
print('tunnel OK:', devs)
" >"$PROBE_LOG" 2>&1; then
    echo "[watch] tunnel answered at $(date)"
    break
  fi
  echo "[watch] probe failed at $(date); retry in 600s"
  sleep 600
done

bash tools/onchip_r3.sh 2>&1 | tee /tmp/onchip_r3_run.log
echo "[watch] runbook done at $(date); headline:"
timeout 2400 python bench.py 2>/tmp/bench_headline.err | tee /tmp/bench_headline.json
echo "[watch] all done at $(date)"
