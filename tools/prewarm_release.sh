#!/usr/bin/env bash
# End-of-round / pre-release ritual: warm the persistent compile cache for every
# graph the driver (or a deployment) will compile, on the FINAL committed tree.
#
# Why this exists: round 4's official bench artifact was rc=124 (timeout) because
# the driver's `python bench.py` paid a cold ~39 min XLA compile over the device
# tunnel. All executables cache in `.jax_cache` (lkgd_tpu/utils/compilation_cache);
# running this script after the last compute-path commit makes the scoring run a
# pure cache-hit (~4 min: init + 4 timed reps).
#
# Order matters: the headline bench first (it is the scored artifact), then the
# single-chip entry() compile-check. Any compute-path commit AFTER this script
# invalidates the warmed keys — re-run it.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/3 headline bench (base img2vid 14f x 576x1024, 25 steps)" >&2
LKGD_BENCH_DEADLINE="${LKGD_BENCH_DEADLINE:-3000}" python bench.py

echo "== 2/3 entry() single-chip compile-check graph" >&2
python __graft_entry__.py

echo "== 3/3 cache state" >&2
ls .jax_cache | wc -l
echo "prewarm complete — do not touch compute-path code after this point" >&2
