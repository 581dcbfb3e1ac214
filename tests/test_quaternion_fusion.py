"""Quaternion linear + latent-knowledge fusion tests, with torch as numerical oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.ops.quaternion import QuaternionLinear, assemble_quaternion_kernel, quaternion_linear
from lkgd_tpu.ops.fusion import DepthwiseCompressor, LatentKnowledgeFusion, interpolate_linear_1d


class TestQuaternionLinear:
    def test_matches_torch_block_matmul(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        in_f, out_f = 16, 8
        wr, wi, wj, wk = [rng.normal(size=(in_f // 4, out_f // 4)).astype(np.float32) for _ in range(4)]
        x = rng.normal(size=(3, in_f)).astype(np.float32)

        # oracle: core_qnn's assembled-kernel matmul re-derived in torch
        tr, ti, tj, tk = map(torch.tensor, (wr, wi, wj, wk))
        cat_r = torch.cat([tr, -ti, -tj, -tk], dim=0)
        cat_i = torch.cat([ti, tr, -tk, tj], dim=0)
        cat_j = torch.cat([tj, tk, tr, -ti], dim=0)
        cat_k = torch.cat([tk, -tj, ti, tr], dim=0)
        W = torch.cat([cat_r, cat_i, cat_j, cat_k], dim=1)
        want = (torch.tensor(x) @ W).numpy()

        got = quaternion_linear(jnp.asarray(x), *map(jnp.asarray, (wr, wi, wj, wk)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_hamilton_product_structure(self):
        # quaternion multiplication by a pure scalar weight must scale each component
        wr = jnp.eye(2) * 2.0
        z = jnp.zeros((2, 2))
        k = assemble_quaternion_kernel(wr, z, z, z)
        x = jnp.arange(8.0)[None, :]
        np.testing.assert_allclose(np.asarray(x @ k), np.asarray(x) * 2.0)

    def test_module_shapes_and_grad(self):
        m = QuaternionLinear(1024, 512)
        params = m.init(jax.random.PRNGKey(0), jnp.ones((2, 1, 1024)))
        y = m.apply(params, jnp.ones((2, 1, 1024)))
        assert y.shape == (2, 1, 512)
        n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
        # 4 factors of (256,128) + bias 512 — 4x fewer weights than a dense 1024x512
        assert n_params == 4 * 256 * 128 + 512


class TestInterpolateLinear:
    def test_matches_torch_interpolate(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 1, 768)).astype(np.float32)
        want = torch.nn.functional.interpolate(torch.tensor(x), size=1024, mode="linear").numpy()
        got = interpolate_linear_1d(jnp.asarray(x), 1024)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_identity(self):
        x = jnp.arange(8.0).reshape(1, 1, 8)
        np.testing.assert_allclose(np.asarray(interpolate_linear_1d(x, 8)), np.asarray(x))


class TestDepthwiseCompressor:
    def test_matches_torch_grouped_conv1d(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 3, 1024)).astype(np.float32)
        w = rng.normal(size=(256, 4)).astype(np.float32)

        conv = torch.nn.Conv1d(1024, 256, kernel_size=1, groups=256, bias=False)
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(w)[:, :, None])
        want = conv(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()

        m = DepthwiseCompressor(1024)
        got = m.apply({"params": {"weight": jnp.asarray(w)}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TestLatentKnowledgeFusion:
    def test_end_to_end_matches_torch_oracle(self):
        """Full fusion vs. an independent torch re-derivation of reference unet :536-595."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        B = 2
        ctx = rng.normal(size=(B, 1, 1024)).astype(np.float32)
        dom = rng.normal(size=(1, 1, 768)).astype(np.float32)  # un-doubled: exercises CFG tiling
        flo = rng.normal(size=(1, 1, 768)).astype(np.float32)

        m = LatentKnowledgeFusion(ctx_dim=1024)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(ctx), jnp.asarray(dom), jnp.asarray(flo))
        got = np.asarray(m.apply(params, jnp.asarray(ctx), jnp.asarray(dom), jnp.asarray(flo)))

        p = jax.tree.map(lambda a: torch.tensor(np.asarray(a)), params["params"])

        def dw(x, w):  # depthwise 4->1 compressor
            xg = x.reshape(*x.shape[:-1], 256, 4)
            return torch.einsum("blog,og->blo", xg, w)

        tctx = torch.tensor(ctx)
        lh = dw(tctx, p["lconv"]["weight"])
        ld = dw(torch.nn.functional.interpolate(torch.tensor(dom), size=1024, mode="linear"),
                p["dconv"]["weight"])
        lf = dw(torch.nn.functional.interpolate(torch.tensor(flo), size=1024, mode="linear"),
                p["fconv"]["weight"])
        ld = torch.cat([ld, ld], dim=0)
        lf = torch.cat([lf, lf], dim=0)
        ctx_l = p["fuse"]["bias"].new_zeros(256) + p["texts"]
        ctx_l = ctx_l.expand_as(lh)

        def quat(x, q):
            r, i, j, k = q["r_weight"], q["i_weight"], q["j_weight"], q["k_weight"]
            W = torch.cat([
                torch.cat([r, -i, -j, -k], 0), torch.cat([i, r, -k, j], 0),
                torch.cat([j, k, r, -i], 0), torch.cat([k, -j, i, r], 0)], 1)
            return x @ W + q["bias"]

        spatial = quat(torch.cat([lh, ld, lf, ctx_l], -1), p["fuse"])
        fl, fd, ff = (torch.fft.rfft(t, dim=-1) for t in (lh, ld, lf))
        mags = [fl.abs(), fd.abs(), ff.abs(), p["texts_fft_mag"].expand_as(fl.abs())]
        phas = [fl.angle(), fd.angle(), ff.angle(), p["texts_fft_pha"].expand_as(fl.abs())]
        mag = quat(torch.cat([t[..., :-1] for t in mags], -1), p["fuse_fft_mag"])
        pha = quat(torch.cat([t[..., :-1] for t in phas], -1), p["fuse_fft_pha"])
        spec = torch.complex(mag * pha.cos(), mag * pha.sin())
        mag0 = torch.stack([t[..., -1] for t in mags], -1) @ p["fuse_fft_mag0"]["kernel"] + p["fuse_fft_mag0"]["bias"]
        pha0 = torch.stack([t[..., -1] for t in phas], -1) @ p["fuse_fft_pha0"]["kernel"] + p["fuse_fft_pha0"]["bias"]
        spec0 = torch.complex(mag0 * pha0.cos(), mag0 * pha0.sin())
        spectral = torch.fft.irfft(torch.cat([spec, spec0], -1), dim=-1)
        h = torch.cat([spatial, spectral], -1)
        h = h @ p["fuse_sf_0"]["kernel"] + p["fuse_sf_0"]["bias"]
        h = torch.nn.functional.leaky_relu(h, 0.1)
        want = (h @ p["fuse_sf_2"]["kernel"] + p["fuse_sf_2"]["bias"]).numpy()

        assert got.shape == (B, 1, 1024)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_without_knowledge_features(self):
        m = LatentKnowledgeFusion(ctx_dim=1024)
        ctx = jnp.ones((2, 1, 1024))
        params = m.init(jax.random.PRNGKey(0), ctx)
        out = m.apply(params, ctx)
        assert out.shape == (2, 1, 1024)
        assert np.isfinite(np.asarray(out)).all()


class TestRealFFT:
    def test_rfft_matches_numpy(self):
        from lkgd_tpu.ops.real_fft import rfft_real, irfft_real
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 3, 256)).astype(np.float32)
        re, im = rfft_real(jnp.asarray(x))
        want = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(np.asarray(re), want.real, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(im), want.imag, rtol=1e-4, atol=1e-3)
        # irfft roundtrip of an arbitrary (not conjugate-symmetric-derived) spectrum
        spec = (rng.normal(size=(2, 3, 129)) + 1j * rng.normal(size=(2, 3, 129))).astype(np.complex64)
        got = irfft_real(jnp.asarray(spec.real), jnp.asarray(spec.imag))
        np.testing.assert_allclose(np.asarray(got), np.fft.irfft(spec, axis=-1), rtol=1e-4, atol=1e-4)


class TestFusionGradSafety:
    def test_constant_input_gradients_finite(self):
        """sqrt/arctan2 at zero FFT bins must not produce NaN gradients (constant feature
        vectors — e.g. fully-dropped conditioning — hit exactly this)."""
        m = LatentKnowledgeFusion(ctx_dim=64)
        ctx = jnp.ones((2, 1, 64))
        dom = jnp.ones((2, 1, 48))
        params = m.init(jax.random.PRNGKey(0), ctx, dom, dom)
        g = jax.grad(lambda p: jnp.sum(m.apply(p, ctx, dom, dom) ** 2))(params)
        assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
