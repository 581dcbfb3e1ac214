#!/bin/bash
# Round-3 measurement queue, part 1: the A/Bs left unmeasured by the round-2 outage.
# Each run appends one line to experiments/r3_results.jsonl.
set -u
cd /root/repo
OUT=experiments/r3_results.jsonl
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local line
  line=$(env "$@" timeout 1800 python bench.py 2>>experiments/r3_queue1.log)
  local rc=$?
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"result\": ${line:-null}}" >> "$OUT"
}
run base_r3 LKGD_BENCH_REPS=3
# HISTORICAL: the fused-QKV path and its LKGD_FUSED_QKV flag were deleted in 2ebf0cb
# (measured slower than the default); re-running this line would just bench the default
# path under a misleading label.
# run fused_qkv LKGD_FUSED_QKV=1 LKGD_BENCH_REPS=3
run maxtrack_flash LKGD_FLASH_MAXTRACK=1 LKGD_BENCH_REPS=3
run train LKGD_BENCH_PIPELINE=train LKGD_BENCH_REPS=5
run vae LKGD_BENCH_PIPELINE=vae LKGD_BENCH_REPS=3
echo "=== queue1 done ($(date +%H:%M:%S)) ===" >&2
