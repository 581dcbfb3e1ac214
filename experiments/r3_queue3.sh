#!/bin/bash
# Round-3 queue 3: the variant pipelines that need sequential CFG on one 16 GB chip
# (batch-doubled trans/controlnet crash the worker / exhaust HBM — BASELINE.md sess 4).
set -u
cd /root/repo
OUT=experiments/r3_results.jsonl
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>>experiments/r3_queue3.log)
  local rc=$?
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"result\": ${line:-null}}" >> "$OUT"
}
run trans_seqcfg LKGD_BENCH_PIPELINE=trans LKGD_BENCH_SEQ_CFG=1 LKGD_BENCH_REPS=2
run controlnet_seqcfg LKGD_BENCH_PIPELINE=controlnet LKGD_BENCH_SEQ_CFG=1 LKGD_BENCH_REPS=2
echo "=== queue3 done ($(date +%H:%M:%S)) ===" >&2
run smooth_seqcfg LKGD_BENCH_PIPELINE=smooth LKGD_BENCH_SEQ_CFG=1 LKGD_BENCH_REPS=2
timeout 1800 python -u experiments/profile_cogvideox_step.py > /tmp/cog_prof.log 2>&1
echo "=== queue3+profile done ($(date +%H:%M:%S)) ===" >&2
