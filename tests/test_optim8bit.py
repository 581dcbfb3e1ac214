"""8-bit Adam moments (training/optim8bit.py) — the bitsandbytes AdamW8bit analog
(reference `train_models/train_svd_lora.py:1197-1207`)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from lkgd_tpu.training.optim8bit import (Quantized8, adamw8bit, dequantize8,
                                         opt_state_bytes, quantize8, scale_by_adam8bit)


class TestQuantize:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32)) * 0.01
        q = quantize8(x, block=256)
        back = dequantize8(q, block=256)
        # absmax-linear: error <= absmax/254 per block
        assert float(jnp.abs(back - x).max()) <= float(jnp.abs(x).max()) / 254 + 1e-9

    def test_shapes_and_dtypes(self):
        x = jnp.ones((3, 5, 7))
        q = quantize8(x, block=32)
        assert q.codes.shape == x.shape and q.codes.dtype == jnp.int8
        assert q.scales.ndim == 1 and q.scales.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(dequantize8(q, block=32)), np.ones((3, 5, 7)),
                                   rtol=1e-2)

    def test_zero_tensor(self):
        q = quantize8(jnp.zeros((300,)))
        assert float(jnp.abs(dequantize8(q)).max()) == 0.0


class TestAdam8bit:
    def _loss(self, p, x):
        return jnp.sum((x @ p["w"] - 1.0) ** 2) + jnp.sum(p["b"] ** 2)

    def test_tracks_fp32_adam(self):
        """Quantized-moment Adam must track fp32 optax.adamw closely over many steps on
        a big-leaf problem (the 8-bit path only engages above min_8bit_size)."""
        rng = np.random.default_rng(1)
        params = {"w": jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32)) * 0.1,
                  "b": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))}
        x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))

        tx8 = adamw8bit(1e-2, min_8bit_size=1024)
        txf = optax.adamw(1e-2)
        s8, sf = tx8.init(params), txf.init(params)
        p8 = pf = params

        @jax.jit
        def step(p, s, tx_idx):
            g = jax.grad(self._loss)(p, x)
            return g

        for _ in range(30):
            g8 = jax.grad(self._loss)(p8, x)
            u8, s8 = tx8.update(g8, s8, p8)
            p8 = optax.apply_updates(p8, u8)
            gf = jax.grad(self._loss)(pf, x)
            uf, sf = txf.update(gf, sf, pf)
            pf = optax.apply_updates(pf, uf)

        # both must reach comparable loss; trajectories stay close
        lf = float(self._loss(pf, x))
        l8 = float(self._loss(p8, x))
        assert l8 < float(self._loss(params, x)) * 0.5
        assert abs(l8 - lf) / max(lf, 1e-6) < 0.15
        # trajectories are not bit-identical (quantized state), but must stay aligned
        a, b = np.asarray(p8["w"]).ravel(), np.asarray(pf["w"]).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.99, cos

    def test_small_leaves_stay_fp32(self):
        params = {"big": jnp.zeros((8192,)), "small": jnp.zeros((16,))}
        state = scale_by_adam8bit(min_8bit_size=4096).init(params)
        assert isinstance(state.mu["big"], Quantized8)
        assert isinstance(state.mu["small"], jnp.ndarray)

    def test_memory_saving(self):
        """Persistent state must be ~4x smaller than fp32 Adam on large params."""
        params = {"w": jnp.zeros((512, 512))}
        s8 = scale_by_adam8bit(min_8bit_size=0).init(params)
        sf = optax.scale_by_adam().init(params)
        b8, bf = opt_state_bytes(s8), opt_state_bytes(sf)
        assert b8 < bf / 3.5, f"8-bit state {b8} vs fp32 {bf}"

    def test_jittable_and_donatable(self):
        params = {"w": jnp.ones((256, 64))}
        tx = adamw8bit(1e-3, min_8bit_size=0)
        state = tx.init(params)

        @jax.jit
        def step(p, s):
            g = jax.tree.map(jnp.ones_like, p)
            u, s2 = tx.update(g, s, p)
            return optax.apply_updates(p, u), s2

        p2, s2 = step(params, state)
        assert np.isfinite(np.asarray(p2["w"])).all()
        assert s2[0].mu["w"].codes.dtype == jnp.int8  # s2[0] = scale_by_adam8bit state

    def test_make_optimizer_integration(self):
        from lkgd_tpu.training.train_state import make_optimizer

        params = {"lora_w": jnp.ones((128, 128)), "frozen_w": jnp.ones((4, 4))}
        tx = make_optimizer(1e-3, trainable_predicate=lambda p: "lora" in p,
                            use_8bit=True)
        state = tx.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        u, _ = tx.update(g, state, params)
        assert float(jnp.abs(u["lora_w"]).max()) > 0
        assert float(jnp.abs(u["frozen_w"]).max()) == 0


class TestPackedEquivalence:
    def test_packed_bitwise_matches_per_leaf(self):
        """packed=True must produce BIT-IDENTICAL updates and quantized moments to the
        per-leaf variant (per-leaf block-boundary padding preserves the block
        partition) across several steps, with mixed small/big leaves."""
        from lkgd_tpu.training.optim8bit import scale_by_adam8bit_packed

        rng = np.random.default_rng(3)
        params = {
            "big_w": jnp.asarray(rng.normal(size=(300, 20)).astype(np.float32)),
            "odd_w": jnp.asarray(rng.normal(size=(5001,)).astype(np.float32)),
            "tiny_b": jnp.asarray(rng.normal(size=(7,)).astype(np.float32)),
        }
        ref = scale_by_adam8bit(min_8bit_size=4096)
        got = scale_by_adam8bit_packed(min_8bit_size=4096)
        s_ref, s_got = ref.init(params), got.init(params)
        upd = jax.jit(lambda g, s: ref.update(g, s))
        updp = jax.jit(lambda g, s: got.update(g, s))
        for step in range(4):
            g = jax.tree.map(
                lambda x: jnp.asarray(
                    rng.normal(size=x.shape).astype(np.float32)) * 0.1, params)
            u_ref, s_ref = upd(g, s_ref)
            u_got, s_got = updp(g, s_got)
            for k in params:
                np.testing.assert_array_equal(np.asarray(u_ref[k]),
                                              np.asarray(u_got[k]), err_msg=k)

    def test_packed_all_small(self):
        """Degenerate case: no big leaves -> zero-size packed buffers still jit."""
        from lkgd_tpu.training.optim8bit import scale_by_adam8bit_packed

        params = {"a": jnp.ones((8,)), "b": jnp.ones((3, 3))}
        tx = scale_by_adam8bit_packed()
        state = tx.init(params)
        u, state = jax.jit(tx.update)(params, state)
        assert u["a"].shape == (8,) and u["b"].shape == (3, 3)

    def test_packed_adamw_integration(self):
        """adamw8bit(packed=True) under multi_transform masking (the make_optimizer
        path) runs and moves only trainable leaves."""
        from lkgd_tpu.training.train_state import make_optimizer

        params = {"lora_a": jnp.ones((80, 80)), "frozen_w": jnp.ones((80, 80))}
        opt = make_optimizer(1e-2, trainable_predicate=lambda p: "lora" in p,
                             use_8bit="packed")
        state = opt.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        u, state = jax.jit(opt.update)(g, state, params)
        assert float(jnp.abs(u["lora_a"]).max()) > 0
        assert float(jnp.abs(u["frozen_w"]).max()) == 0
