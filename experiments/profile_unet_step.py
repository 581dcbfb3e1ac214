"""Per-HLO-op profile of one CFG-doubled full-size SVD UNet step on the real chip.

Writes an xplane trace, then aggregates device-side op time by fusion category —
the BASELINE.md "where the time actually goes" table. Usage:
    python experiments/profile_unet_step.py [--joint] [--reps 3]
"""

import argparse
import collections
import glob
import gzip
import os
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()


def build(joint: bool):
    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition

    cfg = SVDUNetConfig(num_frames=14)
    unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.bfloat16)
    B, T, H, W = 2, 14, 72, 128
    sample = jnp.zeros((B, T, H, W, cfg.in_channels), jnp.bfloat16)
    ts = jnp.full((B,), 0.25 * jnp.log(7.0))
    ehs = jnp.zeros((B, 1, cfg.cross_attention_dim), jnp.bfloat16)
    ids = jnp.asarray([[6.0, 127.0, 0.02]] * B, jnp.float32)
    params = jax.jit(lambda: unet.init(jax.random.PRNGKey(0), sample, ts, ehs, ids))()
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    fn = jax.jit(lambda p, s: unet.apply(p, s, ts, ehs, ids))
    return fn, params, sample


CATS = [
    ("flash", re.compile(r"flash|attn_kernel|custom-call", re.I)),
    ("conv", re.compile(r"convolution", re.I)),
    ("copy", re.compile(r"copy|transpose", re.I)),
    ("allreduce", re.compile(r"all-reduce", re.I)),
    ("fusion", re.compile(r"fusion", re.I)),
]


def parse_xplane(log_dir):
    """Aggregate per-op durations from the xplane proto via tensorboard_plugin_profile
    if available, else fall back to the trace.json.gz event dump."""
    traces = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no trace.json.gz found under", log_dir)
        return
    import json

    with gzip.open(sorted(traces)[-1], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # keep only TensorCore op lanes (pid names like "/device:TPU:0 TensorCore ...")
    pid_names = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    ops = collections.Counter()
    total = 0.0
    for e in events:
        pname = pid_names.get(e["pid"], "")
        if "TensorCore" not in pname and "XLA Op" not in str(e.get("args", {})):
            if "TPU" not in pname:
                continue
        name = e.get("name", "")
        if name.startswith(("region", "Infeed", "Outfeed")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tid = e.get("tid")
        if dur <= 0:
            continue
        cat = next((c for c, rx in CATS if rx.search(name)), "other")
        key = f"{cat}:{name.split('.')[0][:40]}"
        ops[key] += dur
    for k, v in ops.most_common(40):
        print(f"{v:10.2f} ms  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--joint", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/lkgd_profile")
    args = ap.parse_args()

    fn, params, sample = build(args.joint)
    t0 = time.time()
    out = fn(params, sample)
    jax.block_until_ready(out)
    print(f"compile+run {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        jax.block_until_ready(fn(params, sample))
        times.append(time.time() - t0)
    print(f"step times: {[round(t,4) for t in times]}")

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        jax.block_until_ready(fn(params, sample))
    parse_xplane(args.logdir)


if __name__ == "__main__":
    main()
