"""Full-size architecture wiring check: parameter counts must match the HF checkpoints
the porter targets (svd-xt unet 1.524B, temporal VAE 97.7M, CLIP-ViT-H vision 632M).
eval_shape only — no memory cost."""

import numpy as np
import jax
import jax.numpy as jnp


def _count(shapes):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))


def test_svd_unet_param_count():
    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition

    unet = UNetSpatioTemporalCondition(SVDUNetConfig(num_frames=14))
    shapes = jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 14, 72, 128, 8)), jnp.zeros((2,)),
        jnp.zeros((2, 1, 1024)), jnp.zeros((2, 3))))
    n = _count(shapes)
    assert abs(n - 1.524e9) < 5e6, f"got {n/1e9:.4f} B"


def test_vae_and_clip_param_counts():
    from lkgd_tpu.models.clip_vision import CLIPVisionModelWithProjection
    from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder

    vae = AutoencoderKLTemporalDecoder()
    nv = _count(jax.eval_shape(lambda: vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), num_frames=1)))
    assert abs(nv - 97.7e6) < 1e6, f"vae {nv/1e6:.1f} M"

    clip = CLIPVisionModelWithProjection()
    nc = _count(jax.eval_shape(lambda: clip.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))))
    assert abs(nc - 632e6) < 3e6, f"clip {nc/1e6:.1f} M"


def test_cogvideox_5b_param_count():
    from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D

    m = CogVideoXTransformer3D(CogVideoXConfig.cogvideox_5b_i2v(knowledge_fusion=False))
    shapes = jax.eval_shape(lambda: m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 60, 90, 32)), jnp.zeros((1, 226, 4096)),
        jnp.zeros((1,))))
    n = _count(shapes)
    # CogVideoX-5B transformer ~5.6B params
    assert 5.0e9 < n < 6.5e9, f"got {n/1e9:.2f} B"
