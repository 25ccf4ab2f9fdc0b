#!/bin/bash
# Round-3 on-chip validation + A/B runbook (run after the tunnel probe
# answers). Ordered so the highest-value results land first if chip time
# is scarce. Each kernel config runs in its own process; the persistent
# jax compilation cache keeps repeat compiles cheap. Results land in
# /tmp/onchip_r3/ as one JSON line per file.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/onchip_r3
mkdir -p "$OUT"

run() { # name, then command...
  local name=$1; shift
  echo "== $name"
  timeout 1800 "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  local rc=$?
  tail -1 "$OUT/$name.json"
  [ $rc -ne 0 ] && echo "   FAILED rc=$rc (see $OUT/$name.err)"
  return 0
}

# 1. hardware fuzz: validates the production kernel (all modes, incl. the
#    new multi-block superkmers two-plane append) on real silicon
echo "== hardware fuzz"
SMTPU_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_tpu_hardware.py -x -q \
  2>&1 | tail -3

# 2. headline sanity on the production config
run time_rowplace python bench/exp_kernel.py --n 100000000 --c 8192 \
    --input striped2r --compact rowplace

# 3. superkmers A/B: new rowplace path vs the old flat C=4096 path
run time_sk_rowplace python bench/exp_kernel.py --n 100000000 --c 8192 \
    --input striped2r --compact rowplace --mode superkmers
run time_sk_flat python bench/exp_kernel.py --n 100000000 --c 4096 \
    --input striped2r --compact flat --mode superkmers

# 4. experimental variants: bit-exactness on chip first, then timing
for cp in rowsign rowmxu rowsignmxu; do
  run "verify_$cp" python bench/exp_kernel.py --verify --n 3000000 --c 8192 \
      --input striped2r --compact "$cp"
done
for cp in rowsign rowmxu rowsignmxu; do
  run "time_$cp" python bench/exp_kernel.py --n 100000000 --c 8192 \
      --input striped2r --compact "$cp"
done
run verify_sk_rowplace python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --compact rowplace --mode superkmers

# 4b. cross-record pipeline vs per-record sync (new records path)
run records_ab python bench/exp_records.py --nrec 16 --mbp 30

# 4c. device-resident value extraction vs host gather (new values path)
run values_ab python bench/exp_values.py --n 400000000

# 5. ambiguity-plane overhead (what the batch path pays over streaming)
run time_skipamb python bench/exp_kernel.py --n 100000000 --c 8192 \
    --input striped2r --compact rowplace --skip-amb

# 6. stage ablation ladder on the production kernel (cumulative cuts)
for ab in decode hash minl blend sel rank bfly pack; do
  run "ablate_$ab" python bench/exp_kernel.py --n 100000000 --c 8192 \
      --input striped2r --compact rowplace --ablate "$ab"
done

echo "== headline bench.py"
timeout 1800 python bench.py 2>"$OUT/bench.err" | tail -1 | tee "$OUT/bench.json"
echo "== done; artifacts in $OUT"
