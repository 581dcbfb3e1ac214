#!/bin/bash
# Round-3 measurement queue, part 2: train step (longer budget) + variant pipelines.
set -u
cd /root/repo
OUT=experiments/r3_results.jsonl
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>>experiments/r3_queue2.log)
  local rc=$?
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"result\": ${line:-null}}" >> "$OUT"
}
# UNRUNNABLE (BASELINE.md session 12): the axon PJRT build aborts on this flag
# run vmem64 LKGD_BENCH_REPS=2 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536
# run vmem96 LKGD_BENCH_REPS=2 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=98304
run train LKGD_BENCH_PIPELINE=train LKGD_BENCH_REPS=3
run trans LKGD_BENCH_PIPELINE=trans LKGD_BENCH_REPS=2
run controlnet LKGD_BENCH_PIPELINE=controlnet LKGD_BENCH_REPS=2
run cogvideox LKGD_BENCH_PIPELINE=cogvideox LKGD_BENCH_REPS=3
run smooth LKGD_BENCH_PIPELINE=smooth LKGD_BENCH_REPS=2
echo "=== queue2 done ($(date +%H:%M:%S)) ===" >&2
