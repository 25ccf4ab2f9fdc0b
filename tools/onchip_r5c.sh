#!/bin/bash
# Round-5c campaign: the frozen post-rel/rowf32/skipamb-gating tree.
#
# Kernel state under test (all landed BEFORE this ladder, per the
# freeze-before-measuring rule in CLAUDE.md):
#   - HASH_IMPL default flipped to "rel" (r5b ladder: 3/3 clean pairs)
#   - new "rowf32" compaction: f32 one-hot rank + single-dot paint at
#     precision=HIGHEST (no 8-bit limb splits; idx plane 2x16-bit limbs)
#   - skip-ambiguous rebuilt: per-block any-ambiguity scalar prefetch
#     gates the amb DMA + decode + fold; amb DMA double-buffered
#   - row-striped halo extended to ROWSTRIPED_MAX_HALO (large w)
#   - elemR = elemL ^ 0xFFFF micro-opt
#
# Order: silicon bit-exactness FIRST (f32 MXU precision and the new DMA
# schedule cannot be validated in interpret mode), then interleaved A/B
# ladders, then the ablation re-attribution. Results -> /tmp/onchip_r5c;
# commit with `python tools/collect_onchip.py /tmp/onchip_r5c`.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/onchip_r5c
mkdir -p "$OUT"
N=${N:-100000000}

run() { # name, then command...
  local name=$1; shift
  echo "== $name  [$(date +%H:%M:%S)]"
  timeout 2700 "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  local rc=$?
  tail -1 "$OUT/$name.json"
  [ $rc -ne 0 ] && echo "   FAILED rc=$rc (see $OUT/$name.err)"
  return 0
}

# ---- 1. bit-exactness on silicon (new prefetch signature touches every
#         config; f32 dots + HIGHEST precision only provable on MXU) ----
run verify_min_default python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r
run verify_sk_default python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --mode superkmers
run verify_min_rowf32 python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --compact rowf32
run verify_sk_rowf32 python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --mode superkmers --compact rowf32
# uniform 1% Ns flag every 64Kbp block amb-present; the clustered row
# leaves most blocks clean, driving the gated-skip branch AND the
# mixed-block seams on real DMA semantics
run verify_skipamb python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --skip-amb
run verify_skipamb_cluster python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --skip-amb --amb-frac 0.0005 --amb-cluster
run verify_largew python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --k 21 --w 2047

# ---- 2. headline A/B: rowmxu3 (shipping) vs rowf32, interleaved ----
for rep in 1 2 3; do
  run "time_min_rowmxu3_$rep" python bench/exp_kernel.py --n "$N" \
      --c 8192 --input striped2r --compact rowmxu3
  run "time_min_rowf32_$rep" python bench/exp_kernel.py --n "$N" \
      --c 8192 --input striped2r --compact rowf32
done

# ---- 3. super-k-mers A/B: rowf32 vs rowmxu3 vs rowmxu (the rowmxu row
#         also re-certifies the fused.py DEF_COMPACT citation with
#         committed numbers on the CURRENT tree — VERDICT Missing #3) ----
for rep in 1 2 3; do
  run "time_sk_rowmxu3_$rep" python bench/exp_kernel.py --n "$N" \
      --c 8192 --input striped2r --mode superkmers --compact rowmxu3
  run "time_sk_rowf32_$rep" python bench/exp_kernel.py --n "$N" \
      --c 8192 --input striped2r --mode superkmers --compact rowf32
  run "time_sk_rowmxu_$rep" python bench/exp_kernel.py --n "$N" \
      --c 8192 --input striped2r --mode superkmers --compact rowmxu
done

# ---- 4. skip-ambiguous ladder: one compile, four inputs (amb content is
#         data, not a static arg). Baseline plain rows come from step 2. ----
run time_skipamb_frac0 python bench/exp_kernel.py --n "$N" \
    --c 8192 --input striped2r --skip-amb --amb-frac 0
run time_skipamb_cluster python bench/exp_kernel.py --n "$N" \
    --c 8192 --input striped2r --skip-amb --amb-frac 0.01 --amb-cluster
run time_skipamb_u1pct python bench/exp_kernel.py --n "$N" \
    --c 8192 --input striped2r --skip-amb --amb-frac 0.01
run time_skipamb_u3em5 python bench/exp_kernel.py --n "$N" \
    --c 8192 --input striped2r --skip-amb --amb-frac 0.00003

# ---- 5. large-w coverage: fused vs the old XLA-pipeline fallback ----
run time_largew2047 python bench/exp_kernel.py --n "$N" \
    --c 8192 --input striped2r --k 21 --w 2047
run verify_largew8191 python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --k 21 --w 8191
run verify_largew32767 python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --k 21 --w 32767  # VMEM probe

# ---- 6. ablation re-attribution under the shipping kernel ----
for ab in decode hash minl blend sel rank bfly pack; do
  run "ablate_$ab" python bench/exp_kernel.py --n "$N" \
      --c 8192 --input striped2r --ablate "$ab"
done

# ---- 7. hardware fuzz (REQUIRED after any kernel change) ----
echo "== hardware fuzz  [$(date +%H:%M:%S)]"
SMTPU_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_hardware.py \
    -x -q 2>&1 | tail -3

echo "== done [$(date +%H:%M:%S)]; collect with: python tools/collect_onchip.py $OUT"
