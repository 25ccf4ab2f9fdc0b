#!/bin/bash
# Round-3 on-chip validation + A/B runbook (run after the tunnel probe
# answers). Each kernel config runs in its own process; the persistent
# jax compilation cache keeps repeat compiles cheap. Results land in
# /tmp/onchip_r3/ as one JSON line per file.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/onchip_r3
mkdir -p "$OUT"

run() { # name, then command...
  local name=$1; shift
  echo "== $name"
  timeout 1200 "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  local rc=$?
  tail -1 "$OUT/$name.json"
  [ $rc -ne 0 ] && echo "   FAILED rc=$rc (see $OUT/$name.err)"
  return 0
}

echo "== hardware fuzz (incl. multi-block superkmers two-plane append)"
SMTPU_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu_hardware.py -x -q \
  2>&1 | tail -3

# bit-exactness of the compiled variants vs the oracle (small n)
for cp in rowplace rowsign rowmxu rowsignmxu; do
  run "verify_$cp" python bench/exp_kernel.py --verify --n 3000000 --c 8192 \
      --input striped2r --compact "$cp"
done
run verify_sk_rowplace python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --compact rowplace --mode superkmers
run verify_sk_flat python bench/exp_kernel.py --verify --n 3000000 \
    --c 4096 --input striped2r --compact flat --mode superkmers

# timings at n=1e8 (canonical k21 w11 unless noted)
for cp in rowplace rowsign rowmxu rowsignmxu; do
  run "time_$cp" python bench/exp_kernel.py --n 100000000 --c 8192 \
      --input striped2r --compact "$cp"
done
run time_sk_rowplace python bench/exp_kernel.py --n 100000000 --c 8192 \
    --input striped2r --compact rowplace --mode superkmers
run time_sk_flat python bench/exp_kernel.py --n 100000000 --c 4096 \
    --input striped2r --compact flat --mode superkmers

# ambiguity-plane overhead (what the batch path pays over plain streaming)
run time_skipamb python bench/exp_kernel.py --n 100000000 --c 8192 \
    --input striped2r --compact rowplace --skip-amb

# stage ablation ladder on the production kernel (cumulative cuts)
for ab in decode hash minl blend sel rank bfly pack; do
  run "ablate_$ab" python bench/exp_kernel.py --n 100000000 --c 8192 \
      --input striped2r --compact rowplace --ablate "$ab"
done

echo "== headline bench.py"
timeout 1800 python bench.py 2>"$OUT/bench.err" | tail -1 | tee "$OUT/bench.json"
echo "== done; artifacts in $OUT"
