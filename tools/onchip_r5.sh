#!/bin/bash
# Round-5 on-chip ladder: validate + A/B the "rowmxu3" stacked
# single-dot MXU paint (head/tail and hi/lo limbs ride the contraction
# axis: 4 dots -> 1 for the position plane, 8 -> 2 for the superkmer
# idx plane). Ordered so the gating result (Mosaic lowering of the
# stacked paint) lands first. Results land in /tmp/onchip_r5/ as one
# JSON line per file; commit with
# `python tools/collect_onchip.py /tmp/onchip_r5`.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/onchip_r5
mkdir -p "$OUT"

run() { # name, then command...
  local name=$1; shift
  echo "== $name"
  timeout 2400 "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  local rc=$?
  tail -1 "$OUT/$name.json"
  [ $rc -ne 0 ] && echo "   FAILED rc=$rc (see $OUT/$name.err)"
  return 0
}

# 1. Does the stacked paint LOWER on real Mosaic, and is it bit-exact
#    on silicon? (axis-0 concats of (8,C)/(16,C) tiles + the (9,32)
#    one-hot dot are the new surface)
run verify_rowmxu3 python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --compact rowmxu3
run verify_sk_rowmxu3 python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --mode superkmers --compact rowmxu3

# 2. Interleaved A/B pairs (weather cancels pairwise): headline config
for rep in 1 2 3; do
  for cp in rowmxu rowmxu3; do
    run "time_${cp}_$rep" python bench/exp_kernel.py --n 100000000 \
        --c 8192 --input striped2r --compact "$cp"
  done
done

# 3. Hardware fuzz of the production default (overlay refactor touched
#    the shared paint epilogue) — REQUIRED after any kernel change
echo "== hardware fuzz"
SMTPU_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_tpu_hardware.py \
    -x -q 2>&1 | tail -3

# 4. Superkmers A/B (idx plane: 8 dots -> 2)
for rep in 1 2 3; do
  for cp in rowmxu rowmxu3; do
    run "time_sk_${cp}_$rep" python bench/exp_kernel.py --n 100000000 \
        --c 8192 --input striped2r --mode superkmers --compact "$cp"
  done
done

echo "== done; collect with: python tools/collect_onchip.py $OUT"
