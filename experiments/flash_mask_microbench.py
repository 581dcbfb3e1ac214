"""Is the kv_valid masking path what halves flash throughput at CogVideoX S=17776?

r3 DiT profile: flash at ~43 TF/s vs ~87 TF/s in the UNet (same (1024,1024) blocks,
same D=64). The DiT sequence is padded 17776->18432 with in-kernel masking via
jax.lax.cond — which Mosaic may lower as predication (both branches execute), charging
every block the iota+cmp+select cost. A/B: same padded shape with and without masking.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

from lkgd_tpu.ops.flash_attention import _flash_bhsd  # noqa: E402

REPS = 8


def timeit(fn, *args):
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


def main():
    rng = np.random.default_rng(0)
    for bh, s, pad_to, kv_valid in [
        (96, 18432, 18432, None),      # DiT shape, no mask (as if S were tileable)
        (96, 18432, 18432, 17776),     # DiT shape, masked last block (current path)
        (140, 9216, 9216, None),       # UNet reference point
    ]:
        q = jnp.asarray(rng.standard_normal((bh, pad_to, 64)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((bh, pad_to, 64)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((bh, pad_to, 64)), jnp.bfloat16)
        t = timeit(lambda a, b, c: _flash_bhsd(a, b, c, 1024, 1024, kv_valid), q, k, v)
        flops = 4 * pad_to * pad_to * 64 * bh
        print(f"BH={bh} S={pad_to} kv_valid={kv_valid}: {t*1e3:8.2f} ms "
              f"{flops/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
