"""Quantify the GroupNorm-eps ambiguity (VERDICT r4 item 5 / oracle docstring).

diffusers' SpatioTemporal blocks hard-code a mix of 1e-5/1e-6 GroupNorm eps and ignore
the reference's resnet_eps=1e-5 kwarg (unet_spatio_temporal_condition.py:179,280);
diffusers source is unreachable in this environment (not installed, zero egress, no
vendored copy — verified), so instead of asserting which value each block uses, this
measures the OUTPUT impact of the entire ambiguity: the full SVD UNet forward run twice
(resnet_eps=1e-5 vs 1e-6, identical params/input — the worst case, every block flipped)
in fp32 and in bf16.

Expected scale (analytic): GN normalizes by rsqrt(var + eps); activations have var~O(1),
so d(out)/out ~ 0.5 * d(eps) / var ~ 4.5e-6 — three orders below bf16 resolution (~4e-3)
and comparable to fp32 parity tolerances only after ~1000x amplification through the
network. The measurement below bounds the real amplification.
"""

import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

from lkgd_tpu.models.configs import SVDUNetConfig
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition


def main():
    results = {}
    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        cfg5 = SVDUNetConfig(num_frames=4, resnet_eps=1e-5)
        cfg6 = dataclasses.replace(cfg5, resnet_eps=1e-6)
        B, T, H, W = 2, 4, 32, 40  # full architecture, reduced extent
        sample = jax.random.normal(jax.random.PRNGKey(1),
                                   (B, T, H, W, cfg5.in_channels), jnp.float32)
        ts = jnp.full((B,), 0.25 * np.log(7.0))
        ehs = jax.random.normal(jax.random.PRNGKey(2),
                                (B, 1, cfg5.cross_attention_dim), jnp.float32) * 0.1
        ids = jnp.asarray([[6.0, 127.0, 0.02]] * B, jnp.float32)

        unet5 = UNetSpatioTemporalCondition(cfg5, dtype=dtype)
        unet6 = UNetSpatioTemporalCondition(cfg6, dtype=dtype)
        params = jax.jit(lambda: unet5.init(jax.random.PRNGKey(0), sample, ts, ehs,
                                            ids))()
        if dtype == jnp.bfloat16:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        out5 = np.asarray(jax.jit(unet5.apply)(params, sample, ts, ehs, ids),
                          np.float32)
        out6 = np.asarray(jax.jit(unet6.apply)(params, sample, ts, ehs, ids),
                          np.float32)
        d = np.abs(out5 - out6)
        results[dtype_name] = {
            "max_abs_delta": float(d.max()),
            "mean_abs_delta": float(d.mean()),
            "out_std": float(out5.std()),
            "max_rel_to_std": float(d.max() / out5.std()),
            "bit_identical": bool((out5 == out6).all()),
        }
        print(json.dumps({dtype_name: results[dtype_name]}), flush=True)


if __name__ == "__main__":
    main()
