#!/bin/bash
# Round-5 follow-on: the "relrot" hash experiment. _hash_windows
# rewritten with RELATIVE rotations — h[i] = rotl(xor_j rotl(vals[i+j],
# j), rot) — so every rotation in the fold is STATIC per doubling stage
# (multiply | shr; no variable shifts, no iota/mod chains, no
# where-guards) and the final rotations fold into pre-rotated table
# scalars. Bit-exact vs the current form (differential-tested on CPU
# across kinds/k/seed); this ladder validates on silicon and A/Bs.
# Results land in /tmp/onchip_r5b/; commit with
# `python tools/collect_onchip.py /tmp/onchip_r5b`.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/onchip_r5b
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

# 1. Silicon bit-exactness first (the multiply-as-shl family has
#    miscompiled before; interpret mode is exact, silicon is the test)
run verify_relrot python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --hashimpl rel

# 2. Interleaved A/B pairs: headline config, var (status quo) vs rel
for rep in 1 2 3; do
  for hi in var rel; do
    run "time_hash_${hi}_$rep" python bench/exp_kernel.py --n 100000000 \
        --c 8192 --input striped2r --hashimpl "$hi"
  done
done

# 3. The isolated hash block, both impls (attributes the delta)
for hi in var rel; do
  run "ablate_hash_$hi" python bench/exp_kernel.py --n 100000000 \
      --c 8192 --input striped2r --ablate hash --hashimpl "$hi"
done

# 4. Hardware fuzz (REQUIRED after any kernel change)
echo "== hardware fuzz"
SMTPU_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_tpu_hardware.py \
    -x -q 2>&1 | tail -3

echo "== done; collect with: python tools/collect_onchip.py $OUT"
