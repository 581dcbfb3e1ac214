"""Scheduler parity tests.

The reference vendors diffusers' EulerDiscreteScheduler with the Karras fix
(`/root/reference/utils/scheduling_euler_discrete_karras_fix.py`). diffusers is not
installed here, so the oracle is an independent torch/numpy re-derivation of the published
math (EDM Euler step, Karras rho-7 sigmas, SVD scheduler config) written inline below.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lkgd_tpu.schedulers.euler_discrete import (
    EulerDiscreteConfig,
    EulerDiscreteScheduler,
    _convert_to_karras,
    _training_sigmas,
)


def _oracle_karras(sigma_min, sigma_max, n):
    rho = 7.0
    ramp = np.linspace(0, 1, n)
    return (sigma_max ** (1 / rho) + ramp * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho


class TestKarrasSigmas:
    def test_closed_form(self):
        got = _convert_to_karras(np.array([700.0, 0.002]), 25, 0.002, 700.0)
        want = _oracle_karras(0.002, 700.0, 25)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_svd_schedule_endpoints(self):
        sched = EulerDiscreteScheduler(EulerDiscreteConfig.svd()).set_timesteps(25)
        sig = np.asarray(sched.sigmas)
        assert sig.shape == (26,)
        assert np.isclose(sig[0], 700.0, rtol=1e-5)
        assert np.isclose(sig[-2], 0.002, rtol=1e-4)
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig) < 0)

    def test_continuous_timesteps_are_quarter_log_sigma(self):
        sched = EulerDiscreteScheduler(EulerDiscreteConfig.svd()).set_timesteps(25)
        np.testing.assert_allclose(
            np.asarray(sched.timesteps), 0.25 * np.log(np.asarray(sched.sigmas[:-1])), rtol=1e-6
        )

    def test_init_noise_sigma_leading_spacing(self):
        # SVD config uses "leading" spacing -> init sigma = sqrt(max^2+1)
        sched = EulerDiscreteScheduler(EulerDiscreteConfig.svd()).set_timesteps(25)
        assert np.isclose(float(sched.init_noise_sigma), np.sqrt(700.0**2 + 1), rtol=1e-6)


class TestTrainingSigmas:
    def test_scaled_linear_betas_match_torch(self):
        torch = pytest.importorskip("torch")
        cfg = EulerDiscreteConfig.svd()
        betas_t = torch.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, 1000, dtype=torch.float64) ** 2
        acp = torch.cumprod(1.0 - betas_t, dim=0)
        want = ((1 - acp) / acp).sqrt().numpy()
        got = _training_sigmas(cfg)
        np.testing.assert_allclose(got, want, rtol=1e-10)


class TestStep:
    def setup_method(self):
        self.sched = EulerDiscreteScheduler(EulerDiscreteConfig.svd())
        self.schedule = self.sched.set_timesteps(25)

    def test_scale_model_input(self):
        x = jnp.ones((2, 3))
        got = self.sched.scale_model_input(self.schedule, x, 0)
        sigma = float(self.schedule.sigmas[0])
        np.testing.assert_allclose(np.asarray(got), 1.0 / np.sqrt(sigma**2 + 1), rtol=1e-6)

    def test_v_prediction_euler_step_closed_form(self):
        rng = np.random.default_rng(0)
        sample = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
        pred = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
        i = 3
        prev, x0 = self.sched.step(self.schedule, pred, i, sample)
        sigma = np.asarray(self.schedule.sigmas)[i]
        sigma_next = np.asarray(self.schedule.sigmas)[i + 1]
        x0_want = np.asarray(pred) * (-sigma / np.sqrt(sigma**2 + 1)) + np.asarray(sample) / (sigma**2 + 1)
        deriv = (np.asarray(sample) - x0_want) / sigma
        prev_want = np.asarray(sample) + deriv * (sigma_next - sigma)
        np.testing.assert_allclose(np.asarray(x0), x0_want, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(prev), prev_want, rtol=2e-5, atol=1e-6)

    def test_full_loop_converges_linear_model(self):
        # With a perfect v-prediction oracle for x0=0, the Euler ODE must land near 0.
        x = jnp.full((1, 8), float(self.schedule.init_noise_sigma))
        for i in range(self.schedule.num_steps):
            inp = self.sched.scale_model_input(self.schedule, x, i)
            sigma = self.schedule.sigmas[i]
            # oracle for target x0 = 0: denoised = c_out*pred + c_skip*x = 0
            pred = (x / (sigma**2 + 1)) / (sigma / jnp.sqrt(sigma**2 + 1))
            del inp
            x, _ = self.sched.step(self.schedule, pred, i, x)
        assert float(jnp.abs(x).max()) < 1e-3

    def test_add_noise(self):
        x = jnp.zeros((2, 3, 4))
        noise = jnp.ones((2, 3, 4))
        out = self.sched.add_noise(self.schedule, x, noise, jnp.array([0, 5]))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(self.schedule.sigmas)[0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(self.schedule.sigmas)[5], rtol=1e-6)


class TestEDMTrainingMath:
    def test_sigma_sampler_range_and_oracle(self):
        torch = pytest.importorskip("torch")
        import math as _math
        import jax

        from lkgd_tpu.training.edm import EDMConfig, rand_cosine_interpolated

        cfg = EDMConfig()
        sig = rand_cosine_interpolated(jax.random.PRNGKey(0), (4096,), cfg)
        s = np.asarray(sig)
        assert (s > cfg.sigma_min * 0.99).all() and (s < cfg.sigma_max * 1.01).all()

        # oracle: identical math in torch driven by the same uniforms
        u_np = np.asarray(
            (jnp.arange(4096) + jax.random.uniform(jax.random.PRNGKey(0), (4096,))) / 4096.0
        )
        u = torch.tensor(u_np, dtype=torch.float64)

        def logsnr_cos(t, lo, hi):
            t_min = _math.atan(_math.exp(-0.5 * hi))
            t_max = _math.atan(_math.exp(-0.5 * lo))
            return -2 * torch.log(torch.tan(t_min + t * (t_max - t_min)))

        def shifted(t, image_d, noise_d, lo, hi):
            shift = 2 * _math.log(noise_d / image_d)
            return logsnr_cos(t, lo - shift, hi - shift) + shift

        lo = -2 * _math.log(cfg.sigma_min / cfg.sigma_data)
        hi = -2 * _math.log(cfg.sigma_max / cfg.sigma_data)
        lsnr = torch.lerp(shifted(u, 64, 32, lo, hi), shifted(u, 64, 64, lo, hi), u)
        want = (torch.exp(-lsnr / 2) * cfg.sigma_data).numpy()
        np.testing.assert_allclose(s, want, rtol=2e-3)

    def test_loss_weighting_identity(self):
        import jax

        from lkgd_tpu.training.edm import denoise_and_weigh, edm_loss, precondition_inputs

        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (2, 3, 4, 4, 4))
        noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)
        sigmas = jnp.array([0.5, 3.0])
        noisy, inp = precondition_inputs(x, noise, sigmas)
        np.testing.assert_allclose(
            np.asarray(noisy[1]), np.asarray(x[1] + 3.0 * noise[1]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(inp[1]), np.asarray(noisy[1] / np.sqrt(10.0)), rtol=1e-5
        )
        # perfect prediction => denoised == x exactly, loss == 0
        s = sigmas.reshape(2, 1, 1, 1, 1)
        perfect_pred = (x - noisy / (s**2 + 1)) * (-jnp.sqrt(s**2 + 1) / s)
        denoised, _ = denoise_and_weigh(perfect_pred, noisy, sigmas)
        np.testing.assert_allclose(np.asarray(denoised), np.asarray(x), rtol=1e-4, atol=1e-5)
        assert float(edm_loss(perfect_pred, noisy, x, sigmas)) < 1e-7
