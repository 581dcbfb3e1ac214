"""GPipe pipeline parallelism (parallel/pp.py): pipelined execution over a 'stage'
mesh axis must equal the sequential layer scan — first on a synthetic MLP stack, then
on real CogVideoX transformer blocks (the serving integration target)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from lkgd_tpu.parallel.mesh import make_mesh
from lkgd_tpu.parallel.pp import gpipe, stack_block_params


def _sequential(step_fn, stacked_params, state, consts):
    return jax.lax.scan(lambda c, lp: (step_fn(lp, c, consts), None),
                        state, stacked_params)[0]


class TestGPipeMLP:
    def _setup(self, n_layers=8, b=4, d=16):
        rng = np.random.default_rng(0)
        params = {"w": jnp.asarray(rng.normal(0, 0.3, (n_layers, d, d)), jnp.float32),
                  "b": jnp.asarray(rng.normal(0, 0.1, (n_layers, d)), jnp.float32)}
        state = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

        def step(lp, st, cst):
            return jnp.tanh(st @ lp["w"] + lp["b"]) + cst["skip"] * st

        consts = {"skip": jnp.float32(0.5)}
        return step, params, state, consts

    def test_matches_sequential(self):
        step, params, state, consts = self._setup()
        want = _sequential(step, params, state, consts)
        mesh = make_mesh({"stage": 4}, jax.devices()[:4])
        got = gpipe(step, params, state, consts, mesh=mesh, num_microbatches=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6,
                                   atol=1e-6)

    def test_more_microbatches_than_stages(self):
        step, params, state, consts = self._setup(b=8)
        want = _sequential(step, params, state, consts)
        mesh = make_mesh({"stage": 2}, jax.devices()[:2])
        got = gpipe(step, params, state, consts, mesh=mesh, num_microbatches=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6,
                                   atol=1e-6)

    def test_rejects_indivisible(self):
        step, params, state, consts = self._setup(n_layers=6)
        mesh = make_mesh({"stage": 4}, jax.devices()[:4])
        try:
            gpipe(step, params, state, consts, mesh=mesh, num_microbatches=2)
        except ValueError as e:
            assert "stages" in str(e)
        else:
            raise AssertionError("expected ValueError")


class TestGPipeCogVideoX:
    def test_blocks_match_sequential(self):
        """Pipeline the real DiT block stack (4 tiny layers over 4 stages), pass-through
        temb microbatched in the state, RoPE tables replicated in consts."""
        from lkgd_tpu.models.cogvideox import (CogVideoXBlock, CogVideoXConfig,
                                               CogVideoXTransformer3D, rope_3d)

        cfg = dataclasses.replace(CogVideoXConfig.tiny(), num_layers=4)
        model = CogVideoXTransformer3D(cfg)
        b, t, h, w = 4, 2, 4, 4
        hidden_states = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, w, 8))
        prompt = jax.random.normal(jax.random.PRNGKey(1), (b, 8, cfg.text_embed_dim))
        params = model.init(jax.random.PRNGKey(2), hidden_states, prompt,
                            jnp.zeros((b,)))

        stacked = stack_block_params(params["params"], cfg.num_layers)
        block = CogVideoXBlock(cfg, "pp")
        inner = cfg.inner_dim
        hp = h // cfg.patch_size
        hidden = jax.random.normal(jax.random.PRNGKey(3),
                                   (b, t * hp * hp, inner), jnp.float32)
        encoder = jax.random.normal(jax.random.PRNGKey(4), (b, 8, inner), jnp.float32)
        temb = jax.random.normal(jax.random.PRNGKey(5), (b, inner), jnp.float32)
        rope = rope_3d(t, hp, hp, cfg.attention_head_dim)

        def step(lp, st, cst):
            hid, enc = block.apply({"params": lp}, st["hidden"], st["encoder"],
                                   st["temb"], cst)
            return {"hidden": hid, "encoder": enc, "temb": st["temb"]}

        state = {"hidden": hidden, "encoder": encoder, "temb": temb}
        want = _sequential(step, stacked, state, rope)
        mesh = make_mesh({"stage": 4}, jax.devices()[:4])
        got = gpipe(step, stacked, state, rope, mesh=mesh, num_microbatches=2)
        for k in state:
            np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                       rtol=2e-5, atol=2e-5)


def test_full_forward_with_pp_blocks_matches_plain():
    """End-to-end: CogVideoXTransformer3D.apply(blocks_override=gpipe blocks) ==
    the plain forward — PP is consumable on the real model, not just the primitive."""
    from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D
    from lkgd_tpu.parallel.pp import cogvideox_pp_blocks

    cfg = dataclasses.replace(CogVideoXConfig.tiny(), num_layers=4)
    model = CogVideoXTransformer3D(cfg)
    b = 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 2, 4, 4, 8))
    pe = jax.random.normal(jax.random.PRNGKey(1), (b, 8, cfg.text_embed_dim))
    ts = jnp.zeros((b,))
    params = model.init(jax.random.PRNGKey(2), x, pe, ts)
    want = model.apply(params, x, pe, ts)

    mesh = make_mesh({"stage": 4}, jax.devices()[:4])
    blocks = cogvideox_pp_blocks(cfg, params, mesh, num_microbatches=2)
    got = model.apply(params, x, pe, ts, blocks_override=blocks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
