#!/bin/bash
# Round-3 queue 4: joint/control variants at the reference's own 576x320 trans
# resolution (full-size 576x1024 runs crash the 16 GB worker even sequential-CFG —
# r3_queue3.log), giving honest on-chip numbers at a reference-faithful config.
set -u
cd /root/repo
OUT=experiments/r3_results.jsonl
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>>experiments/r3_queue4.log)
  local rc=$?
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"result\": ${line:-null}}" >> "$OUT"
}
run trans_576x320 LKGD_BENCH_PIPELINE=trans LKGD_BENCH_SIZE=576x320 LKGD_BENCH_REPS=2
run controlnet_576x320 LKGD_BENCH_PIPELINE=controlnet LKGD_BENCH_SIZE=576x320 LKGD_BENCH_REPS=2
run smooth_576x320 LKGD_BENCH_PIPELINE=smooth LKGD_BENCH_SIZE=576x320 LKGD_BENCH_REPS=2
echo "=== queue4 done ($(date +%H:%M:%S)) ===" >&2
