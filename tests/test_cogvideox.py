"""CogVideoX DiT, DDIM scheduler, I2V pipeline, train step (tiny configs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D, rope_3d
from lkgd_tpu.models.configs import LoraRouter, LoraRule
from lkgd_tpu.pipelines.cogvideox_i2v import (
    CogVideoXImageToVideoPipeline, CogVideoXPipelineConfig, make_cogvideox_train_step)
from lkgd_tpu.schedulers.cogvideox_ddim import CogVideoXDDIMConfig, CogVideoXDDIMScheduler
from lkgd_tpu.training.train_state import init_train_state, make_optimizer

TCFG = CogVideoXConfig.tiny()


class TestScheduler:
    def test_snr_shift_and_zero_terminal(self):
        s = CogVideoXDDIMScheduler()
        assert abs(s.alphas_cumprod[-1]) < 1e-10  # zero terminal SNR
        assert s.alphas_cumprod[0] > 0.99

    def test_ddim_roundtrip_perfect_model(self):
        # a perfect v-prediction collapses to x0 over the full schedule
        s = CogVideoXDDIMScheduler()
        sched = s.set_timesteps(10)
        x0_true = jnp.ones((1, 4)) * 0.5
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (1, 4))
        for i in range(sched.num_steps):
            a_t = sched.alphas_cumprod_t[i]
            v = jnp.sqrt(a_t) * (x - jnp.sqrt(a_t) * x0_true) / jnp.maximum(
                jnp.sqrt(1 - a_t), 1e-8) if False else (
                jnp.sqrt(a_t) * x - x0_true) / jnp.maximum(jnp.sqrt(1.0 - a_t), 1e-8)
            x, _ = s.step(sched, v, i, x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true), atol=1e-3)

    def test_velocity_definition(self):
        s = CogVideoXDDIMScheduler()
        x = jnp.ones((2, 3))
        noise = jnp.ones((2, 3)) * 2.0
        t = jnp.array([100, 500])
        v = s.get_velocity(x, noise, t)
        acp = jnp.asarray(s.alphas_cumprod, jnp.float32)[t][:, None]
        want = jnp.sqrt(acp) * noise - jnp.sqrt(1 - acp) * x
        np.testing.assert_allclose(np.asarray(v), np.asarray(want), rtol=1e-5)


class TestTransformer:
    def test_forward_shapes_and_fusion(self):
        model = CogVideoXTransformer3D(TCFG)
        x = jnp.ones((2, 3, 4, 4, 8))
        ctx = jnp.ones((2, 8, 64))
        dom = jnp.ones((2, 1, 48))
        params = model.init(jax.random.PRNGKey(0), x, ctx, jnp.zeros((2,)),
                            domain_features=dom, flow_features=dom)
        out = model.apply(params, x, ctx, jnp.zeros((2,)), domain_features=dom,
                          flow_features=dom)
        assert out.shape == (2, 3, 4, 4, 4)
        # zero-init fusion output: identical to no knowledge features at init
        out2 = model.apply(params, x, ctx, jnp.zeros((2,)), domain_features=dom * 5,
                           flow_features=dom)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)

    def test_rope_shapes(self):
        cos, sin = rope_3d(3, 4, 5, 16)
        assert cos.shape == (60, 16) and sin.shape == (60, 16)


class TestPipelineAndTraining:
    def test_pipeline(self):
        pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=9,
                                       num_inference_steps=3)
        pipe = CogVideoXImageToVideoPipeline(pcfg, TCFG, dtype=jnp.float32)
        params = pipe.init_params(jax.random.PRNGKey(0))
        out = pipe(params, jnp.ones((1, 8, 64)), jnp.ones((1, 4, 4, 4)))
        assert out.shape == (1, 3, 4, 4, 4)
        assert np.isfinite(out).all()

    def test_lora_train_step_descends(self):
        tcfg = CogVideoXConfig.tiny(lora=LoraRouter(rules=(
            LoraRule(pattern="*attn1*", name="ft", rank=2,
                     projections=("to_q", "to_k", "to_v", "to_out")),)))
        model = CogVideoXTransformer3D(tcfg)
        opt = make_optimizer(1e-3, trainable_predicate=lambda p: "lora" in p
                             or "knowledge_fusion" in p)
        batch = {"latents": jnp.ones((2, 3, 4, 4, 4)) * 0.1,
                 "image_latents": jnp.ones((2, 4, 4, 4)) * 0.2,
                 "prompt_embeds": jnp.ones((2, 8, 64)),
                 "domain_features": jnp.ones((2, 1, 48)),
                 "flow_features": jnp.ones((2, 1, 48))}
        p = model.init(jax.random.PRNGKey(0), jnp.ones((2, 3, 4, 4, 8)),
                       batch["prompt_embeds"], jnp.zeros((2,)),
                       domain_features=batch["domain_features"],
                       flow_features=batch["flow_features"])
        step = jax.jit(make_cogvideox_train_step(model, opt))
        state = init_train_state(p, opt)
        k = jax.random.PRNGKey(1)
        losses = []
        for _ in range(6):
            state, loss = step(state, batch, k)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


def test_cogvideox_mesh_inference_matches_unsharded():
    from lkgd_tpu.parallel.mesh import make_mesh, replicated

    mesh = make_mesh({"data": 2, "context": 4})
    # (29-1)/4+1 = 8 latent frames -> divisible by context=4
    pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=29,
                                   num_inference_steps=2)
    pipe0 = CogVideoXImageToVideoPipeline(pcfg, TCFG, dtype=jnp.float32)
    params = pipe0.init_params(jax.random.PRNGKey(0))
    prompt, img = jnp.ones((1, 8, 64)), jnp.ones((1, 4, 4, 4))
    ref = pipe0(params, prompt, img)

    pipe = CogVideoXImageToVideoPipeline(pcfg, TCFG, dtype=jnp.float32, mesh=mesh)
    with jax.set_mesh(mesh):
        sharded = jax.device_put(params, replicated(mesh))
        out = pipe(sharded, prompt, img)
    assert out.shape == (1, 8, 4, 4, 4)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_cogvideox_sequence_parallel_matches_dense():
    """Ulysses / ring SP attention inside the DiT must reproduce the dense model —
    same params, full pipeline, 4-way context mesh (VERDICT round-1 item #3)."""
    from lkgd_tpu.parallel.mesh import make_mesh, replicated

    pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=29,
                                   num_inference_steps=2)
    import dataclasses

    tcfg = dataclasses.replace(CogVideoXConfig.tiny(), num_attention_heads=4)  # ulysses: H % P == 0
    pipe0 = CogVideoXImageToVideoPipeline(pcfg, tcfg, dtype=jnp.float32)
    params = pipe0.init_params(jax.random.PRNGKey(0))
    prompt, img = jnp.ones((1, 8, 64)) * 0.3, jnp.ones((1, 4, 4, 4)) * 0.5
    ref = pipe0(params, prompt, img)

    mesh = make_mesh({"context": 4}, jax.devices()[:4])
    for mode in ("ulysses", "ring"):
        sp_cfg = dataclasses.replace(tcfg, sequence_parallel=mode)
        pipe = CogVideoXImageToVideoPipeline(pcfg, sp_cfg, dtype=jnp.float32, mesh=mesh)
        with jax.set_mesh(mesh):
            sharded = jax.device_put(params, replicated(mesh))
            out = pipe(sharded, prompt, img)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5, err_msg=mode)


def test_cogvideox_t2v_pipeline():
    """T2V = the loop without image conditioning (reference CogVideoXPipeline,
    cli_demo.py:122); transformer in_channels == out_channels."""
    import dataclasses

    from lkgd_tpu.pipelines.cogvideox_i2v import CogVideoXTextToVideoPipeline

    tcfg = dataclasses.replace(TCFG, in_channels=TCFG.out_channels)
    pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=9,
                                   num_inference_steps=2)
    pipe = CogVideoXTextToVideoPipeline(pcfg, tcfg, dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    prompt = jnp.ones((1, 8, 64))
    out = pipe(params, prompt, rng=jax.random.PRNGKey(1))
    assert out.shape == (1, 3, 4, 4, 4)
    assert np.isfinite(out).all()
    # deterministic for a fixed key
    out2 = pipe(params, prompt, rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(out, out2)


def test_cogvideox_v2v_pipeline_strength():
    """V2V (SDEdit) runs only the strength-tail of the schedule from the noised input
    (reference CogVideoXVideoToVideoPipeline, cli_demo.py:124)."""
    import dataclasses

    from lkgd_tpu.pipelines.cogvideox_i2v import CogVideoXVideoToVideoPipeline

    tcfg = dataclasses.replace(TCFG, in_channels=TCFG.out_channels)
    pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=9,
                                   num_inference_steps=4)
    pipe = CogVideoXVideoToVideoPipeline(pcfg, tcfg, dtype=jnp.float32, strength=0.5)
    assert pipe.start_index == 2  # 4 * (1 - 0.5)
    params = pipe.init_params(jax.random.PRNGKey(0))
    prompt = jnp.ones((1, 8, 64))
    video_lat = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4, 4, 4))
    out = pipe(params, prompt, video_lat, rng=jax.random.PRNGKey(1))
    assert out.shape == (1, 3, 4, 4, 4)
    assert np.isfinite(out).all()
    # lower strength preserves more of the input video
    gentle = CogVideoXVideoToVideoPipeline(pcfg, tcfg, dtype=jnp.float32, strength=0.25)
    out_g = gentle(params, prompt, video_lat, rng=jax.random.PRNGKey(1))
    d_strong = float(np.abs(out - np.asarray(video_lat)).mean())
    d_gentle = float(np.abs(out_g - np.asarray(video_lat)).mean())
    assert d_gentle < d_strong


@pytest.mark.slow
def test_cogvideox_t2v_train_step_descends():
    import dataclasses

    from lkgd_tpu.models.cogvideox import CogVideoXTransformer3D

    tcfg = dataclasses.replace(TCFG, in_channels=TCFG.out_channels)
    model = CogVideoXTransformer3D(tcfg, dtype=jnp.float32)
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 4, 4))
    prompt = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64))
    p = model.init(jax.random.PRNGKey(2), latents, prompt, jnp.zeros((1,)))
    opt = make_optimizer(learning_rate=1e-3)
    step = jax.jit(make_cogvideox_train_step(model, opt, mode="t2v"))
    state = init_train_state(p, opt)
    batch = {"latents": latents, "prompt_embeds": prompt}
    losses = []
    k = jax.random.PRNGKey(3)
    for _ in range(6):
        state, loss = step(state, batch, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


class TestTiledDecode:
    """Spatially tiled VAE decode (reference cli_demo.py vae.enable_tiling() analog)."""

    def _setup(self):
        from lkgd_tpu.models.vae_cogvideox import (AutoencoderKLCogVideoX,
                                                   CogVideoXVAEConfig)

        vae = AutoencoderKLCogVideoX(CogVideoXVAEConfig.tiny())
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16, 16, 4))
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)))
        full = vae.apply(params, z, method=AutoencoderKLCogVideoX.decode)
        return vae, params, z, full

    @pytest.mark.slow
    def test_single_tile_is_exact(self):
        from lkgd_tpu.models.vae_cogvideox import tiled_decode

        vae, params, z, full = self._setup()
        one = tiled_decode(vae, params, z, tile_latent_height=16, tile_latent_width=16)
        np.testing.assert_allclose(np.asarray(one), np.asarray(full), atol=1e-5)

    def test_multi_tile_geometry_and_blend(self):
        from lkgd_tpu.models.vae_cogvideox import tiled_decode

        vae, params, z, full = self._setup()
        tiled = tiled_decode(vae, params, z, tile_latent_height=8, tile_latent_width=8)
        assert tiled.shape == full.shape
        assert bool(jnp.isfinite(tiled).all())
        # tiles can't see past their boundary (true of the reference too) but the
        # blended mosaic must stay statistically close to the full decode
        d = np.abs(np.asarray(tiled) - np.asarray(full))
        assert d.mean() < float(jnp.std(full)), (d.mean(), float(jnp.std(full)))

    def test_uneven_edge_tiles(self):
        """h/w not a multiple of the stride: edge tiles shift inward, shape preserved."""
        from lkgd_tpu.models.vae_cogvideox import tiled_decode

        vae, params, _, _ = self._setup()
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 14, 10, 4))
        out = tiled_decode(vae, params, z, tile_latent_height=8, tile_latent_width=8)
        assert out.shape == (1, 17, 14 * 4, 10 * 4, 3)
        assert bool(jnp.isfinite(out).all())


class TestChunkedDecode:
    """Conv-cached streaming decode (diffusers num_latent_frames_batch_size analog)."""

    def test_causal_conv_cache_is_exact(self):
        from lkgd_tpu.models.vae_cogvideox import CausalConv3d

        conv = CausalConv3d(6)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 7, 8, 8, 4))
        params = conv.init(jax.random.PRNGKey(1), x)
        full = conv.apply(params, x)
        y1, mut = conv.apply(params, x[:, :3], "first", mutable=["cache"])
        y2, _ = conv.apply({**params, "cache": mut["cache"]}, x[:, 3:], "cont",
                           mutable=["cache"])
        got = jnp.concatenate([y1, y2], axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=1e-6)

    def test_chunked_decode_shape_and_stats(self):
        from lkgd_tpu.models.vae_cogvideox import (AutoencoderKLCogVideoX,
                                                   CogVideoXVAEConfig, chunked_decode)

        vae = AutoencoderKLCogVideoX(CogVideoXVAEConfig.tiny())
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8, 8, 4))
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)))
        full = vae.apply(params, z, method=AutoencoderKLCogVideoX.decode)
        chunked = chunked_decode(vae, params, z, chunk_latent_frames=2)
        assert chunked.shape == full.shape
        assert bool(jnp.isfinite(chunked).all())
        # conv caches are exact; the only divergence is per-chunk GroupNorm statistics
        # (identical to diffusers' chunked decode behavior)
        d = np.abs(np.asarray(chunked) - np.asarray(full))
        assert d.mean() < float(jnp.std(full)), (d.mean(), float(jnp.std(full)))

    def test_single_chunk_equals_full(self):
        from lkgd_tpu.models.vae_cogvideox import (AutoencoderKLCogVideoX,
                                                   CogVideoXVAEConfig, chunked_decode)

        vae = AutoencoderKLCogVideoX(CogVideoXVAEConfig.tiny())
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8, 8, 4))
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)))
        full = vae.apply(params, z, method=AutoencoderKLCogVideoX.decode)
        got = chunked_decode(vae, params, z, chunk_latent_frames=3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=1e-5)

    def test_tiled_plus_chunked_compose(self):
        """The full diffusers memory ladder: spatial tiles, each streamed in
        conv-cached temporal chunks."""
        from lkgd_tpu.models.vae_cogvideox import (AutoencoderKLCogVideoX,
                                                   CogVideoXVAEConfig, tiled_decode)

        vae = AutoencoderKLCogVideoX(CogVideoXVAEConfig.tiny())
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16, 16, 4))
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)))
        plain_tiled = tiled_decode(vae, params, z, tile_latent_height=8,
                                   tile_latent_width=8)
        both = tiled_decode(vae, params, z, tile_latent_height=8, tile_latent_width=8,
                            chunk_latent_frames=2)
        assert both.shape == plain_tiled.shape
        assert bool(jnp.isfinite(both).all())
        d = np.abs(np.asarray(both) - np.asarray(plain_tiled))
        assert d.mean() < float(jnp.std(plain_tiled))


class TestChunkedTiledEncode:
    """Encode-side serving ladder (diffusers tiled_encode / frame batching analog)."""

    def _setup(self, t=9, hw=32):
        from lkgd_tpu.models.vae_cogvideox import (AutoencoderKLCogVideoX,
                                                   CogVideoXVAEConfig)

        vae = AutoencoderKLCogVideoX(CogVideoXVAEConfig.tiny())
        x = jax.random.normal(jax.random.PRNGKey(1), (1, t, hw, hw, 3))
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, hw, hw, 3)))
        full = vae.apply(params, x, method=AutoencoderKLCogVideoX.encode_mode)
        return vae, params, x, full

    def test_single_chunk_equals_full(self):
        from lkgd_tpu.models.vae_cogvideox import chunked_encode

        vae, params, x, full = self._setup(t=9)
        got = chunked_encode(vae, params, x, chunk_frames=12)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=1e-5)

    def test_chunked_shape_and_stats(self):
        from lkgd_tpu.models.vae_cogvideox import chunked_encode

        vae, params, x, full = self._setup(t=9)
        got = chunked_encode(vae, params, x, chunk_frames=4)
        assert got.shape == full.shape
        assert bool(jnp.isfinite(got).all())
        d = np.abs(np.asarray(got) - np.asarray(full))
        assert d.mean() < float(jnp.std(full)), (d.mean(), float(jnp.std(full)))

    def test_chunk_must_divide_compression(self):
        import pytest

        from lkgd_tpu.models.vae_cogvideox import chunked_encode

        vae, params, x, _ = self._setup(t=9)
        with pytest.raises(ValueError):
            chunked_encode(vae, params, x, chunk_frames=3)

    def test_tiled_single_tile_exact_and_multi_tile_geometry(self):
        from lkgd_tpu.models.vae_cogvideox import tiled_encode

        vae, params, x, full = self._setup(t=5, hw=32)
        one = tiled_encode(vae, params, x, tile_height=32, tile_width=32)
        np.testing.assert_allclose(np.asarray(one), np.asarray(full), atol=1e-5)
        tiled = tiled_encode(vae, params, x, tile_height=16, tile_width=16,
                             chunk_frames=4)
        assert tiled.shape == full.shape
        assert bool(jnp.isfinite(tiled).all())


@pytest.mark.slow
def test_remat_forward_matches_and_grads_finite():
    """cfg.remat=True (5B training memory lever, DeepSpeed activation-checkpointing
    analog) must not change the forward values or the param tree."""
    import dataclasses as dc

    cfg = CogVideoXConfig.tiny()
    model = CogVideoXTransformer3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 8))
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.text_embed_dim))
    ts = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(2), x, pe, ts)
    want = model.apply(params, x, pe, ts)

    rmodel = CogVideoXTransformer3D(dc.replace(cfg, remat=True))
    got = rmodel.apply(params, x, pe, ts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    def loss(p):
        return jnp.mean(rmodel.apply(p, x, pe, ts) ** 2)

    grads = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads))


class TestCogVideoX15:
    """CogVideoX 1.5 temporal patching (patch_size_t; reference cli_demo.py supports
    THUDM/CogVideoX1.5-5b*)."""

    def test_forward_shapes_and_odd_frames_raise(self):
        import dataclasses as dc

        cfg = dc.replace(CogVideoXConfig.tiny(), patch_size_t=2)
        model = CogVideoXTransformer3D(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4, 8))
        pe = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.text_embed_dim))
        params = model.init(jax.random.PRNGKey(2), x, pe, jnp.zeros((1,)))
        out = model.apply(params, x, pe, jnp.zeros((1,)))
        assert out.shape == (1, 4, 4, 4, 4)
        assert bool(jnp.isfinite(out).all())

        import pytest

        with pytest.raises(ValueError):
            model.init(jax.random.PRNGKey(2), x[:, :3], pe, jnp.zeros((1,)))

    def test_pipeline_pads_latent_frames(self):
        import dataclasses as dc

        from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                                      CogVideoXPipelineConfig)

        tcfg = dc.replace(CogVideoXConfig.tiny(), patch_size_t=2)
        pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=9,
                                       num_inference_steps=2)
        assert pcfg.latent_frames == 3  # odd — 1.5 needs a multiple of 2
        pipe = CogVideoXImageToVideoPipeline(pcfg, tcfg, dtype=jnp.float32)
        assert pipe.latent_frames == 4
        params = pipe.init_params(jax.random.PRNGKey(0))
        lat = pipe(params, jnp.ones((1, 8, 64)), jnp.ones((1, 4, 4, 4)))
        assert lat.shape == (1, 4, 4, 4, 4)
        assert bool(jnp.isfinite(lat).all())

    def test_1_5_preset_param_count(self):
        import numpy as _np

        m = CogVideoXTransformer3D(CogVideoXConfig.cogvideox1_5_5b(
            knowledge_fusion=False))
        shapes = jax.eval_shape(lambda: m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 60, 90, 16)),
            jnp.zeros((1, 226, 4096)), jnp.zeros((1,))))
        n = sum(int(_np.prod(x.shape)) for x in jax.tree.leaves(shapes))
        assert 5.0e9 < n < 6.5e9, f"got {n/1e9:.2f} B"


class TestCogVideoX2B:
    """CogVideoX-2b: sincos positions instead of RoPE (use_rope=False; reference
    cli_demo.py supports THUDM/CogVideoX-2b)."""

    def test_forward_runs_and_positions_matter(self):
        import dataclasses as dc

        cfg = dc.replace(CogVideoXConfig.tiny(), use_rope=False)
        model = CogVideoXTransformer3D(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 8))
        pe = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.text_embed_dim))
        params = model.init(jax.random.PRNGKey(2), x, pe, jnp.zeros((1,)))
        out = model.apply(params, x, pe, jnp.zeros((1,)))
        assert out.shape == (1, 2, 4, 4, 4)
        assert bool(jnp.isfinite(out).all())
        # spatially permuting the input must NOT merely permute the output
        # (the sincos table injects absolute positions)
        xp = x[:, :, ::-1]
        outp = model.apply(params, xp, pe, jnp.zeros((1,)))
        assert np.abs(np.asarray(outp[:, :, ::-1]) - np.asarray(out)).max() > 1e-4

    def test_2b_preset_param_count(self):
        m = CogVideoXTransformer3D(CogVideoXConfig.cogvideox_2b(knowledge_fusion=False))
        shapes = jax.eval_shape(lambda: m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 60, 90, 16)),
            jnp.zeros((1, 226, 4096)), jnp.zeros((1,))))
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
        assert 1.4e9 < n < 2.1e9, f"got {n/1e9:.2f} B"

    def test_sincos_table_shape(self):
        from lkgd_tpu.models.cogvideox import sincos_pos_embed_3d

        pos = sincos_pos_embed_3d(64, 3, 4, 5)
        assert pos.shape == (3 * 4 * 5, 64)
        assert bool(jnp.isfinite(pos).all())


def test_generate_segmented_matches_one_scan():
    """Segmented dispatch (generate_segmented: step indices as data, one compiled
    K-step program re-dispatched) must reproduce the one-scan DDIM path exactly —
    it is a dispatch-granularity knob, not an approximation."""
    import numpy as np

    from lkgd_tpu.models.cogvideox import CogVideoXConfig
    from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                                  CogVideoXPipelineConfig)

    pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=9,
                                   num_inference_steps=7, scheduler="ddim")
    pipe = CogVideoXImageToVideoPipeline(pcfg, CogVideoXConfig.tiny(),
                                         dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64)) * 0.1
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4)) * 0.5
    rng = jax.random.PRNGKey(3)
    one = np.asarray(pipe._generate(params, pe, jnp.zeros_like(pe), img, rng,
                                    None, None))
    segd = np.asarray(pipe.generate_segmented(params, pe, img, rng=rng,
                                              segment_steps=3))  # 3+3+1 ragged tail
    np.testing.assert_allclose(segd, one, rtol=2e-5, atol=2e-5)
