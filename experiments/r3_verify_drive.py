"""Round-3 verify drive: exercise this session's changed surfaces on the REAL chip.

Covers: knowledge fusion through ops/real_fft (Nyquist +0.0 pin — spectral code must run
on the device per skill notes), the attention stack post fused-QKV deletion (full joint
UNet forward), the temporal joint branch (now unscaled, reference parity), and one
8-bit-Adam train step (training/optim8bit.py).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

print("devices:", jax.devices())
assert jax.default_backend() != "cpu"

from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, LoraRule, SVDUNetConfig
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition

cfg = SVDUNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64,
    knowledge_fusion=True,
    joint=JointAttentionConfig(post="conv", flip=True, mask=(0, 1), spatial=True,
                               temporal=True),
    lora=LoraRouter(rules=(LoraRule("*attn1n*", "yx", 4, 4.0, (0, 1)),)))
unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.float32)

rng = np.random.default_rng(0)
sample = jnp.asarray(rng.standard_normal((2, 3, 8, 8, 8)), jnp.float32)
ts = jnp.full((2,), 0.25 * np.log(7.0))
ehs = jnp.asarray(rng.standard_normal((2, 1, 64)), jnp.float32)
ids = jnp.ones((2, 3))
dom = jnp.asarray(rng.standard_normal((2, 1, 48)), jnp.float32)

params = unet.init(jax.random.PRNGKey(0), sample, ts, ehs, ids,
                   domain_features=dom, flow_features=dom)
t0 = time.time()
out_dev = jax.jit(lambda p: unet.apply(p, sample, ts, ehs, ids, domain_features=dom,
                                       flow_features=dom))(params)
out_dev = np.asarray(out_dev)
print(f"TPU joint+fusion UNet forward OK {out_dev.shape} ({time.time()-t0:.1f}s)")

# same forward on CPU (fp32 reference): device numerics must agree to bf16-ish tol
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    params_c = jax.device_put(params, cpu)
    out_cpu = np.asarray(jax.jit(
        lambda p: unet.apply(p, sample, ts, ehs, ids, domain_features=dom,
                             flow_features=dom))(params_c))
err = np.abs(out_dev - out_cpu).max() / (np.abs(out_cpu).max() + 1e-9)
print(f"TPU vs CPU rel err: {err:.2e}")
assert err < 5e-2, err

# 8-bit Adam step on device
from lkgd_tpu.training.optim8bit import adamw8bit
import optax

tx = adamw8bit(1e-3, min_8bit_size=0)
p0 = {"w": jnp.asarray(rng.standard_normal((512, 512)), jnp.float32) * 0.1}
st = tx.init(p0)


@jax.jit
def step8(p, s):
    g = jax.tree.map(lambda x: x * 0.01, p)
    u, s2 = tx.update(g, s, p)
    return optax.apply_updates(p, u), s2


p1, st1 = step8(p0, st)
assert bool(jnp.isfinite(p1["w"]).all())
assert st1[0].mu["w"].codes.dtype == jnp.int8
print("TPU 8-bit Adam step OK (int8 moment state on device)")
print("VERIFY DRIVE PASSED")
