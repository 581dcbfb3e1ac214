"""Temporal (frame-axis) attention: where do the ~120 ms/step of copies go, and what
is recoverable?

r3 profile bucket: copies+reshape+relayout ~120 ms/step, attributed to the temporal
attention batch dims — XLA lowers the batched einsums in FrameAxisAttention
(`bqphd,bkphd->bphqk`) by physically transposing q/k/v from spatial-major
(B, T, HW, H, D) to batch-major (B, HW, H, T, D) and back. This bench measures, per
UNet level at the CFG-doubled base-pipeline shape:

  einsum    the production path (attention core only, q/k/v precomputed)
  xpose     explicit transpose -> flat (B*HW*H, T, D) dot -> transpose back
            (what XLA effectively does, made visible)
  membound  one elementwise pass over q,k,v (the pure-bandwidth floor)

If einsum >> membound, a Pallas frame-axis kernel (one strided read, VMEM-local
transpose, tiny VPU dots) is worth building; its target time is ~membound.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

REPS = 20


def timeit(fn, *args):
    # NOTE: block_until_ready does NOT synchronize over the axon tunnel — force a
    # value read like every other microbench here (matmul_microbench.py).
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    times = []
    for _i in range(3):
        t0 = time.time()
        for _j in range(REPS):
            out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        times.append((time.time() - t0) / REPS)
    return sorted(times)[1]


@functools.partial(jax.jit, static_argnames=("t", "heads"))
def einsum_path(q, k, v, t, heads):
    bt, hw, inner = q.shape
    b = bt // t
    d = inner // heads
    scale = d**-0.5
    qh = q.reshape(b, t, hw, heads, d)
    kh = k.reshape(b, t, hw, heads, d)
    vh = v.reshape(b, t, hw, heads, d)
    logits = jnp.einsum("bqphd,bkphd->bphqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bphqk,bkphd->bqphd", probs, vh, preferred_element_type=q.dtype)
    return out.reshape(bt, hw, inner)


@functools.partial(jax.jit, static_argnames=("t", "heads"))
def xpose_path(q, k, v, t, heads):
    bt, hw, inner = q.shape
    b = bt // t
    d = inner // heads
    scale = d**-0.5

    def to_tok(x):
        return x.reshape(b, t, hw, heads, d).transpose(0, 2, 3, 1, 4).reshape(-1, t, d)

    qt, kt, vt = to_tok(q), to_tok(k), to_tok(v)
    logits = jnp.einsum("ntd,nsd->nts", qt, kt, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("nts,nsd->ntd", probs, vt, preferred_element_type=q.dtype)
    return out.reshape(b, hw, heads, t, d).transpose(0, 3, 1, 2, 4).reshape(bt, hw, inner)


@jax.jit
def membound(q, k, v):
    return q + k * 0.5 + v * 0.25


def main():
    rng = np.random.default_rng(0)
    bt, t = 28, 14  # CFG-doubled base pipeline
    for hw, c, heads, n_blocks in [(9216, 320, 5, 4), (2304, 640, 10, 4),
                                   (576, 1280, 20, 7)]:
        q = jnp.asarray(rng.standard_normal((bt, hw, c)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((bt, hw, c)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((bt, hw, c)), jnp.bfloat16)
        te = timeit(lambda a, b_, c_: einsum_path(a, b_, c_, t, heads), q, k, v)
        tx = timeit(lambda a, b_, c_: xpose_path(a, b_, c_, t, heads), q, k, v)
        tm = timeit(membound, q, k, v)
        gb = 3 * bt * hw * c * 2 / 1e9
        print(f"hw={hw:5d} C={c:4d} h={heads:2d} (x{n_blocks}/step): "
              f"einsum {te*1e3:7.2f} ms  xpose {tx*1e3:7.2f} ms  "
              f"membound {tm*1e3:6.2f} ms ({gb/tm:5.0f} GB/s)  "
              f"step cost ~{n_blocks*te*1e3:6.1f} ms vs floor {n_blocks*tm*1e3:5.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
