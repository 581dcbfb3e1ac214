"""SVD UNet tests: shapes, variants, joint-attention semantics, LoRA routing."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, LoraRule, SVDUNetConfig
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition

TINY = SVDUNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1,
    num_attention_heads=(2, 4),
    cross_attention_dim=64,
)


def _inputs(b=2, t=4, h=16, w=16, ctx=64, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, t, h, w, 8)).astype(np.float32)),
        jnp.zeros((b,)),
        jnp.asarray(rng.normal(size=(b, 1, ctx)).astype(np.float32)),
        jnp.ones((b, 3)),
    )


class TestBaseUNet:
    def test_shapes(self):
        model = UNetSpatioTemporalCondition(TINY)
        args = _inputs()
        params = model.init(jax.random.PRNGKey(0), *args)
        out = model.apply(params, *args)
        assert out.shape == (2, 4, 16, 16, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_timestep_sensitivity(self):
        model = UNetSpatioTemporalCondition(TINY)
        args = _inputs()
        params = model.init(jax.random.PRNGKey(0), *args)
        out0 = model.apply(params, args[0], jnp.zeros((2,)), args[2], args[3])
        out1 = model.apply(params, args[0], jnp.ones((2,)) * 2.0, args[2], args[3])
        assert float(jnp.abs(out0 - out1).max()) > 1e-4

    def test_controlnet_residual_injection(self):
        model = UNetSpatioTemporalCondition(TINY)
        args = _inputs()
        params = model.init(jax.random.PRNGKey(0), *args)
        out0 = model.apply(params, *args)
        # mid residual shifts the output
        mid = jnp.ones((2 * 4, 8, 8, 64))
        out1 = model.apply(params, *args, mid_block_additional_residual=mid)
        assert float(jnp.abs(out0 - out1).max()) > 1e-4


class TestJointAttention:
    def _model(self, **joint_kw):
        cfg = dataclasses.replace(
            TINY, joint=JointAttentionConfig(mask=(0, 1), spatial=True, temporal=True, **joint_kw))
        return UNetSpatioTemporalCondition(cfg)

    def test_zero_init_matches_base(self):
        """Fresh joint branches are zero-projected: output == base UNet with same weights."""
        model = self._model()
        args = _inputs()
        params = model.init(jax.random.PRNGKey(0), *args)
        out_on = model.apply(params, *args, joint_scale=1.0)
        out_off = model.apply(params, *args, joint_scale=0.0)
        np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off), atol=1e-6)

    def test_streams_couple_after_perturbing_post(self):
        """With a non-zero post projection, stream 0's output depends on stream 1's input."""
        model = self._model()
        args = _inputs()
        params = model.init(jax.random.PRNGKey(0), *args)
        # kick every conv1n away from zero
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: v + 0.05 if "conv1n" in jax.tree_util.keystr(p) else v, params)
        base = model.apply(params, *args, joint_scale=1.0)
        # perturb ONLY stream 1's input
        sample2 = args[0].at[1].add(1.0)
        out2 = model.apply(params, sample2, *args[1:], joint_scale=1.0)
        # stream 0 must change (coupling); without joint it must not
        delta_coupled = float(jnp.abs(out2[0] - base[0]).max())
        assert delta_coupled > 1e-5
        # joint_scale=0 silences the SPATIAL branch only: the reference's temporal
        # forward adds its joint branch unscaled (patch/patch.py:657-660 — joint_scale
        # appears only in the spatial path, :500), so test the off-switch on a
        # spatial-only joint model.
        model_sp = UNetSpatioTemporalCondition(dataclasses.replace(
            TINY, joint=JointAttentionConfig(mask=(0, 1), spatial=True, temporal=False)))
        params_sp = model_sp.init(jax.random.PRNGKey(0), *args)
        params_sp = jax.tree_util.tree_map_with_path(
            lambda p, v: v + 0.05 if "conv1n" in jax.tree_util.keystr(p) else v, params_sp)
        out_nojoint = model_sp.apply(params_sp, *args, joint_scale=0.0)
        out2_nojoint = model_sp.apply(params_sp, sample2, *args[1:], joint_scale=0.0)
        assert float(jnp.abs(out2_nojoint[0] - out_nojoint[0]).max()) < 1e-5

    def test_partner_perm(self):
        assert JointAttentionConfig(mask=(0, 1)).partner_perm == (1, 0)
        assert JointAttentionConfig(mask=(0, 1, 0, 1)).partner_perm == (1, 0, 3, 2)
        assert JointAttentionConfig(mask=(1, 0, 1, 0)).partner_perm == (1, 0, 3, 2)
        with pytest.raises(ValueError):
            JointAttentionConfig(mask=(1, 1, 0, 1))

    def test_conv_fuse_and_scale_posts(self):
        for post in ("scale", "conv_fuse"):
            model = self._model(post=post)
            args = _inputs()
            params = model.init(jax.random.PRNGKey(0), *args)
            out = model.apply(params, *args)
            assert np.isfinite(np.asarray(out)).all()


class TestLoraRouting:
    def test_stream_masked_lora_only_touches_masked_rows(self):
        cfg = dataclasses.replace(TINY, lora=LoraRouter(rules=(
            LoraRule(pattern="*attn1.*", name="y", rank=2, streams=(0, 1)),)))
        model = UNetSpatioTemporalCondition(cfg)
        args = _inputs()
        params = model.init(jax.random.PRNGKey(0), *args)
        out0 = model.apply(params, *args)
        # B is nonzero after perturbation -> adapter active on stream 1 only
        params_hot = jax.tree_util.tree_map_with_path(
            lambda p, v: v + 0.05 if "lora_y_B" in jax.tree_util.keystr(p) else v, params)
        out1 = model.apply(params_hot, *args)
        d0 = float(jnp.abs(out1[0] - out0[0]).max())
        d1 = float(jnp.abs(out1[1] - out0[1]).max())
        assert d1 > 1e-4, "masked stream must be affected"
        assert d0 < 1e-6, f"unmasked stream must be untouched, got {d0}"

    def test_zero_B_init_is_identity(self):
        cfg = dataclasses.replace(TINY, lora=LoraRouter(rules=(
            LoraRule(pattern="*attn*", name="a", rank=2),)))
        base = UNetSpatioTemporalCondition(TINY)
        lora = UNetSpatioTemporalCondition(cfg)
        args = _inputs()
        p_lora = lora.init(jax.random.PRNGKey(0), *args)
        # strip adapters -> params usable by base model
        out_l = lora.apply(p_lora, *args)
        p_base = jax.tree_util.tree_map_with_path(lambda p, v: v, p_lora)
        out_b = base.apply(p_base, *args)
        np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_b), atol=1e-6)


class TestVariants:
    def test_knowledge_fusion_changes_output_only_via_context(self):
        cfg = dataclasses.replace(TINY, knowledge_fusion=True)
        model = UNetSpatioTemporalCondition(cfg)
        args = _inputs()
        dom = jnp.ones((2, 1, 48))
        params = model.init(jax.random.PRNGKey(0), *args, domain_features=dom, flow_features=dom)
        out0 = model.apply(params, *args, domain_features=dom, flow_features=dom)
        out1 = model.apply(params, *args, domain_features=dom * 3.0, flow_features=dom)
        assert float(jnp.abs(out0 - out1).max()) > 1e-5

    def test_dual_cond_conv_in_zero_alpha_matches_single(self):
        """flow-variant: zero-init alpha means the second head is inert at init
        (reference unet_..._flow.py conv_in2_alpha zero-init)."""
        cfg = dataclasses.replace(TINY, dual_cond_conv_in=True)
        model = UNetSpatioTemporalCondition(cfg)
        rng = np.random.default_rng(1)
        sample = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 12)).astype(np.float32))
        args = (sample, jnp.zeros((2,)), jnp.ones((2, 1, 64)), jnp.ones((2, 3)))
        params = model.init(jax.random.PRNGKey(0), *args)
        out = model.apply(params, *args)
        assert out.shape == (2, 4, 16, 16, 4)
        # alpha=0: output must ignore the cond2 channels entirely
        sample2 = sample.at[..., 8:].add(5.0)
        out2 = model.apply(params, sample2, *args[1:])
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


class TestGroupNorm:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        from lkgd_tpu.models.layers import GroupNorm
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 8, 8, 64)).astype(np.float32) * 3 + 1
        m = GroupNorm(32, 1e-5)
        p = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        p = jax.tree.map(lambda v: v + 0.3, p)
        got = np.asarray(m.apply(p, jnp.asarray(x)))
        gn = torch.nn.GroupNorm(32, 64, eps=1e-5)
        with torch.no_grad():
            gn.weight.fill_(1.3)
            gn.bias.fill_(0.3)
            want = gn(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=5e-6)


def test_resnet_eps_knobs():
    """resnet_eps / resnet_eps_cross / resnet_eps_up change the graph only where they
    should: same params tree, outputs shift when any knob flips (the diffusers
    per-block-type eps mix surface — see SVDUNetConfig comments)."""
    import dataclasses

    import numpy as np

    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition

    kw = dict(block_out_channels=(32, 64),
              down_block_types=("CrossAttnDownBlockSpatioTemporal",
                                "DownBlockSpatioTemporal"),
              up_block_types=("UpBlockSpatioTemporal",
                              "CrossAttnUpBlockSpatioTemporal"),
              layers_per_block=1, num_attention_heads=(2, 4),
              cross_attention_dim=32, num_frames=2)
    cfg = SVDUNetConfig(**kw)
    unet = UNetSpatioTemporalCondition(cfg)
    B, T, H, W = 1, 2, 16, 16
    sample = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, 8))
    ts = jnp.zeros((B,))
    ehs = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 32)) * 0.1
    ids = jnp.ones((B, 3))
    params = unet.init(jax.random.PRNGKey(0), sample, ts, ehs, ids)
    base = np.asarray(unet.apply(params, sample, ts, ehs, ids))

    for repl in (dict(resnet_eps=1e-6),
                 dict(resnet_eps_cross=1e-6),
                 dict(resnet_eps_up=1e-6)):
        alt = UNetSpatioTemporalCondition(dataclasses.replace(cfg, **repl))
        out = np.asarray(alt.apply(params, sample, ts, ehs, ids))
        assert not np.array_equal(out, base), repl
    # cross+up at 1e-6 with resnet_eps=1e-6 == uniform 1e-6
    all6 = UNetSpatioTemporalCondition(dataclasses.replace(
        cfg, resnet_eps=1e-6, resnet_eps_cross=1e-6, resnet_eps_up=1e-6))
    uni6 = UNetSpatioTemporalCondition(dataclasses.replace(cfg, resnet_eps=1e-6))
    np.testing.assert_array_equal(np.asarray(all6.apply(params, sample, ts, ehs, ids)),
                                  np.asarray(uni6.apply(params, sample, ts, ehs, ids)))
