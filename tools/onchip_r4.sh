#!/bin/bash
# Round-4 on-chip validation + A/B runbook. Ordered so the highest-value
# results land first if chip time is scarce. Each config runs in its own
# process; the persistent jax compilation cache keeps repeat compiles
# cheap. Results land in /tmp/onchip_r4/ as one JSON line per file;
# commit them with `python tools/collect_onchip.py /tmp/onchip_r4`.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/onchip_r4
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

# 1. hardware fuzz: validates the production kernel (rowmxu default) on
#    real silicon — REQUIRED after any kernel change
echo "== hardware fuzz"
SMTPU_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_tpu_hardware.py -x -q \
  2>&1 | tail -3

# 2. headline + the 3x compaction A/B behind the round-4 default flip
run bench_headline python bench.py
for rep in 1 2 3; do
  for cp in rowplace rowsign rowmxu rowsignmxu; do
    run "time_${cp}_$rep" python bench/exp_kernel.py --n 100000000 --c 8192 \
        --input striped2r --compact "$cp"
  done
done
for cp in rowsign rowmxu rowsignmxu; do
  run "verify_$cp" python bench/exp_kernel.py --verify --n 3000000 --c 8192 \
      --input striped2r --compact "$cp"
done

# 3. records wave schedule vs serial (interleaved pairs) at three scales
run records_wave30 python bench/exp_records.py --nrec 16 --mbp 30 --repeats 5
run records_wave8  python bench/exp_records.py --nrec 16 --mbp 8 --repeats 5
run records_wave01 python bench/exp_records.py --nrec 200 --mbp 0.1 --repeats 4

# 4. FASTA end-to-end (file -> records -> wave sketch), 1.08 Gbp synthetic
#    (or CHM13 when $HUMAN_GENOME_FA exists)
run fasta_e2e python bench/exp_fasta.py

# 5. device-values A/B with the honest (warm, median) host baselines
run values_ab python bench/exp_values.py --n 400000000

# 6. superkmers: MXU idx-plane paint (round-4 extension) vs rowplace,
#    verified then A/B'd; plus skip-ambiguity overhead
run verify_sk_rowmxu python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --mode superkmers --compact rowmxu
run verify_sk_rowplace python bench/exp_kernel.py --verify --n 3000000 \
    --c 8192 --input striped2r --mode superkmers --compact rowplace
for rep in 1 2 3; do
  run "time_sk_rowmxu_$rep" python bench/exp_kernel.py --n 100000000 \
      --c 8192 --input striped2r --mode superkmers --compact rowmxu
  run "time_sk_rowplace_$rep" python bench/exp_kernel.py --n 100000000 \
      --c 8192 --input striped2r --mode superkmers --compact rowplace
done
run time_skipamb python bench/exp_kernel.py --n 100000000 --c 8192 \
    --input striped2r --skip-amb

# 7. stage ablation ladder on the production kernel (cumulative cuts)
for ab in decode hash minl blend sel rank bfly pack; do
  run "ablate_$ab" python bench/exp_kernel.py --n 100000000 --c 8192 \
      --input striped2r --ablate "$ab"
done

echo "== done; artifacts in $OUT (collect with tools/collect_onchip.py)"
