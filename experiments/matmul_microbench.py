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
    (64512, 640, 640),    # level-1 dots
    (258048, 1280, 320),  # FF down
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


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    print("backend:", jax.default_backend())
    for m, k, n in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        flops = 2 * m * k * n

        t_xla = timeit(jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16)), x, w)
        print(f"({m},{k})x({k},{n})  XLA: {t_xla*1e3:7.3f} ms  {flops/t_xla/1e12:6.1f} TF/s")
        for bm in (512, 1024, 2048, 4096):
            if m % bm:
                continue
            try:
                f = jax.jit(functools.partial(pallas_matmul, bm=bm))
                t = timeit(f, x, w)
                ok = np.allclose(np.asarray(f(x, w), np.float32),
                                 np.asarray(x, np.float32) @ np.asarray(w, np.float32),
                                 rtol=0.1, atol=1.0)
                print(f"    pallas bm={bm:5d}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s"
                      f"  {'OK' if ok else 'WRONG'}")
            except Exception as e:  # noqa: BLE001
                print(f"    pallas bm={bm:5d}: FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
