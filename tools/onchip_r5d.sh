#!/bin/bash
# Round-5d: rowmxu4 (int8 chunk-32 MXU rank) decision ladder + the
# post-edit hardware fuzz. Results -> bench/onchip_r5d_results.json via
# tools/collect_onchip.py. Verdict: rejected 3/3 (see fused.py DEF_COMPACT).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/onchip_r5d
mkdir -p "$OUT"
run() {
  local name=$1; shift
  echo "== $name  [$(date +%H:%M:%S)]"
  timeout 3000 "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  tail -1 "$OUT/$name.json"
  return 0
}
run verify_rowmxu4 python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --compact rowmxu4
for rep in 1 2 3; do
  run "time_min_rowmxu3_$rep" python bench/exp_kernel.py --n 100000000 \
      --c 8192 --input striped2r --compact rowmxu3
  run "time_min_rowmxu4_$rep" python bench/exp_kernel.py --n 100000000 \
      --c 8192 --input striped2r --compact rowmxu4
done
echo "== hardware fuzz  [$(date +%H:%M:%S)]"
SMTPU_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_hardware.py \
    -x -q 2>&1 | tail -3
echo "== done [$(date +%H:%M:%S)]"
