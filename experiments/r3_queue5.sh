#!/bin/bash
# Round-3 queue 5: full-size variant retries with synthetic-bf16 param
# materialization (the fp32-init+cast transient was the 16 GB OOM source).
set -u
cd /root/repo
OUT=experiments/r3_results.jsonl
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>>experiments/r3_queue5.log)
  local rc=$?
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"result\": ${line:-null}}" >> "$OUT"
}
run trans_full_synthinit LKGD_BENCH_PIPELINE=trans LKGD_BENCH_SEQ_CFG=1 LKGD_BENCH_REPS=2
run controlnet_full_synthinit LKGD_BENCH_PIPELINE=controlnet LKGD_BENCH_SEQ_CFG=1 LKGD_BENCH_REPS=2
run smooth_full_synthinit LKGD_BENCH_PIPELINE=smooth LKGD_BENCH_SEQ_CFG=1 LKGD_BENCH_REPS=2
run base_final LKGD_BENCH_REPS=3
echo "=== queue5 done ($(date +%H:%M:%S)) ===" >&2
