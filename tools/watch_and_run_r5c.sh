#!/bin/bash
# Round-5c tunnel watcher: probe until the chip answers, then run the
# r5c campaign (post-rel/rowf32/skipamb-gating ladder + hardware fuzz).
# Same probe structure as watch_and_run_onchip.sh (see comments there).
set -u
cd "$(dirname "$0")/.."
PROBE_LOG=/tmp/probe_tunnel.log

while true; do
  if ! python -c "
import socket
s = socket.socket(); s.settimeout(3)
s.connect(('127.0.0.1', 8082)); s.close()
" 2>/dev/null; then
    sleep 120
    continue
  fi
  echo "[watch] relay port accepts at $(date); attempting device claim"
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
  echo "[watch] claim failed at $(date); retry in 900s"
  sleep 900
done

bash tools/onchip_r5c.sh 2>&1 | tee /tmp/onchip_r5c_run.log
echo "[watch] runbook done at $(date)"
