"""Microbench: the UNet's narrow-channel matmul shapes — XLA vs Pallas vs qkv packings.

The r3 per-op profile puts ~325 ms/step in generic matmul fusions; round-2 measured the
(M~258k, 320)x(320, 320) dots at 24 TF/s — far below the MXU roof (197 TF/s) AND the
HBM roof (~330 MB moved -> ~0.4 ms). This checks (a) whether a VMEM-blocked Pallas
matmul beats the XLA emitter there, and (b) how the three qkv projections should be
packed (separate dots / wide (C,3C)+lane-split / middle-axis (C,3,C) einsum).

Timing methodology: the axon tunnel's dispatch+fetch roundtrip is ~33 ms, so per-call
timing is useless for sub-ms kernels. Each measurement runs REPS iterations inside ONE
jitted lax.fori_loop with a 1-element data dependency between iterations (x[0,...] +=
out[0,...]*1e-30 — cannot be CSE'd or hoisted), and fetches one scalar at the end.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

REPS = 50


def timeit_loop(op, x, w):
    """Median-of-3 of (fori_loop(REPS, op) wall time / REPS); op(x, w) -> (out_scalar)."""

    @jax.jit
    def run(x, w):
        def body(_, carry):
            xc, acc = carry
            s = op(xc, w)
            xc = xc.at[(0,) * xc.ndim].add(s.astype(xc.dtype) * 1e-30)
            return xc, acc + s

        _, acc = jax.lax.fori_loop(0, REPS, body, (x, jnp.float32(0)))
        return acc

    _ = float(run(x, w))  # compile
    times = []
    for _i in range(3):
        t0 = time.time()
        _ = float(run(x, w))
        times.append(time.time() - t0)
    return sorted(times)[1] / REPS


def _consume(out):
    # FULL-tensor reduction: consuming a single element lets XLA strength-reduce the
    # whole dot to one row (measured "283 TF/s" > the 197 peak). The sum fuses into the
    # matmul epilogue, costing the same in every variant.
    return jnp.sum(out, dtype=jnp.float32)


def qkv_variants():
    m, c = 258048 // 64, 320
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, 64, c)), jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((c, 3, c)), jnp.bfloat16)
    flops = 2 * m * 64 * c * 3 * c

    def separate(xc, w):
        outs = [jnp.dot(xc, w[:, i], preferred_element_type=jnp.bfloat16)
                for i in range(3)]
        return sum(_consume(o) for o in outs)

    def wide(xc, w):
        y = jnp.dot(xc, w.reshape(c, 3 * c), preferred_element_type=jnp.bfloat16)
        q, k, v = jnp.split(y, 3, axis=-1)
        return _consume(q) + _consume(k) + _consume(v)

    def middle(xc, w):
        y = jnp.einsum("bsc,cpn->bspn", xc, w, preferred_element_type=jnp.bfloat16)
        return _consume(y[:, :, 0]) + _consume(y[:, :, 1]) + _consume(y[:, :, 2])

    for name, fn in [("separate", separate), ("wide+split", wide),
                     ("middle-axis", middle)]:
        t = timeit_loop(fn, x, w3)
        print(f"  qkv {name:12s}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)


def pallas_matmul(x, w, bm):
    m, k = x.shape
    _, n = w.shape

    def kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                             preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, w)


def main():
    print("backend:", jax.default_backend(), flush=True)
    qkv_variants()
    for m, k, n in [(258048, 320, 320), (258048, 320, 1280)]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        flops = 2 * m * k * n

        t = timeit_loop(lambda a, b: _consume(
            jnp.dot(a, b, preferred_element_type=jnp.bfloat16)), x, w)
        print(f"({m},{k})x({k},{n})  XLA: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s",
              flush=True)
        for bm in (1024,):
            f = functools.partial(pallas_matmul, bm=bm)
            try:
                ok = np.allclose(np.asarray(jax.jit(f)(x, w), np.float32),
                                 np.asarray(x, np.float32) @ np.asarray(w, np.float32),
                                 rtol=0.1, atol=1.0)
                t = timeit_loop(lambda a, b: _consume(f(a, b)), x, w)
                print(f"    pallas bm={bm:5d}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s"
                      f"  {'OK' if ok else 'WRONG'}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"    pallas bm={bm:5d}: FAILED {type(e).__name__}: {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
