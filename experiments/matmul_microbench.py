"""Microbench: Pallas tall-skinny matmul vs XLA at the UNet's narrow-channel shapes.

The r3 per-op profile puts ~325 ms/step in generic matmul fusions; the round-2
clean-layout ceiling measurements showed the (M~258k, 320)x(320, 320) dots running at
24 TF/s — far below both the MXU roof (197) and the HBM roof (~0.4 ms for 330 MB moved,
i.e. ~130 eff-TF/s). This tests whether a simple VMEM-blocked Pallas matmul (weights
resident, M-blocked activations) can beat the XLA emitter at those aspect ratios.
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

SHAPES = [
    (258048, 320, 320),   # level-0 qkv/out/proj dots
    (258048, 320, 1280),  # level-0 FF up half
]


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


def timeit(fn, *args, reps=10):
    # block_until_ready over the axon relay can return early (see bench.py) — force a
    # device->host scalar fetch to close each timing window
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.time()
    for _i in range(reps):
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    return (time.time() - t0) / reps


def qkv_variants():
    """The three N=320 qkv dots: separate vs wide-concat vs middle-axis-3 einsum.
    The round-3 A/B showed packed (C,3C)+split LOSES 0.5%; hypothesis: the 320-boundary
    slice is lane-misaligned. "bsc,cph->bsph" with W (C,3,HD) makes the split a
    major-dim index instead."""
    m, c = 258048 // 64, 320  # (B*T, HW, C) shaped as (4032, 64, 320)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, 64, c)), jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((c, 3, c)), jnp.bfloat16)
    flops = 2 * m * 64 * c * 3 * c

    def separate(x, w3):
        outs = [jnp.dot(x, w3[:, i], preferred_element_type=jnp.bfloat16)
                for i in range(3)]
        return outs[0] + outs[1] * 2 + outs[2] * 3  # consume all three

    def wide(x, w3):
        y = jnp.dot(x, w3.reshape(c, 3 * c), preferred_element_type=jnp.bfloat16)
        q, k, v = jnp.split(y, 3, axis=-1)
        return q + k * 2 + v * 3

    def middle(x, w3):
        y = jnp.einsum("bsc,cpn->bspn", x, w3, preferred_element_type=jnp.bfloat16)
        return y[:, :, 0] + y[:, :, 1] * 2 + y[:, :, 2] * 3

    for name, fn in [("separate", separate), ("wide+split", wide),
                     ("middle-axis", middle)]:
        f = jax.jit(fn)
        t = max(timeit(f, x, w3) - NULL_S, 1e-9)
        print(f"  qkv {name:12s}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")


NULL_S = 0.0


def main():
    global NULL_S
    print("backend:", jax.default_backend())
    z = jnp.zeros((8, 8), jnp.float32)
    NULL_S = timeit(jax.jit(lambda a: a[0, :1] + 1.0), z, reps=20)
    print(f"null dispatch+fetch roundtrip: {NULL_S*1e3:.3f} ms (subtracted below)")
    qkv_variants()
    for m, k, n in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        flops = 2 * m * k * n

        t_xla = max(timeit(jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16)), x, w) - NULL_S, 1e-9)
        print(f"({m},{k})x({k},{n})  XLA: {t_xla*1e3:7.3f} ms  {flops/t_xla/1e12:6.1f} TF/s")
        for bm in (1024, 2048):
            if m % bm:
                continue
            try:
                f = jax.jit(functools.partial(pallas_matmul, bm=bm))
                t = max(timeit(f, x, w) - NULL_S, 1e-9)
                ok = np.allclose(np.asarray(f(x, w), np.float32),
                                 np.asarray(x, np.float32) @ np.asarray(w, np.float32),
                                 rtol=0.1, atol=1.0)
                print(f"    pallas bm={bm:5d}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s"
                      f"  {'OK' if ok else 'WRONG'}")
            except Exception as e:  # noqa: BLE001
                print(f"    pallas bm={bm:5d}: FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
