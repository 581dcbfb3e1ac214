"""CogVideoX DPM-Solver++ scheduler (SDE 2M) — functional, scan-friendly.

The reference recommends this sampler for CogVideoX-5B: `CogVideo-main/inference/
cli_demo.py:135-140` switches the pipeline to ``CogVideoXDPMScheduler`` (paired with
``use_dynamic_cfg=True``), and the finetune pipeline threads its two-sample multistep
state (`finetune/models/cogvideox_i2v/pipeline_cogvideox_image2video.py:832,875-882`:
``old_pred_original_sample`` + ``timestep_back``).

Math: SDE-DPM-Solver++(2M) on the same snr-shifted zero-terminal-SNR alphas as the
DDIM scheduler, in log-SNR time lambda = log(sqrt(acp/(1-acp))). One step from t to s
with h = lambda_s - lambda_t:

    first order:   x_s = (sigma_s/sigma_t) e^{-h} x_t + a_s (1 - e^{-2h}) x0
                         + sigma_s sqrt(1 - e^{-2h}) z
    second order:  x0 -> (1 + 1/(2r)) x0 - 1/(2r) x0_old,  r = h_last / h

where a = sqrt(acp), sigma = sqrt(1-acp), z ~ N(0, I). The first step (no history) and
the final step (acp_prev = 1, h = inf, the update collapses to x_s = x0) run first
order, matching the reference's ``old_pred_original_sample is None or prev_timestep<0``
branch. Carry ``(sample, x0)`` through ``lax.scan``; the returned x0 is the next step's
history.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from lkgd_tpu.schedulers.cogvideox_ddim import (CogVideoXDDIMConfig,
                                                CogVideoXDDIMScheduler)

CogVideoXDPMConfig = CogVideoXDDIMConfig  # same beta/acp schedule family


class DPMSchedule(NamedTuple):
    timesteps: jnp.ndarray  # (N,) int32, descending
    alphas_cumprod_t: jnp.ndarray  # (N,)
    alphas_cumprod_prev: jnp.ndarray  # (N,) acp at the next (lower-noise) timestep
    second_order_ok: jnp.ndarray  # (N,) bool: has history AND prev timestep >= 0

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def _lamb(acp):
    return 0.5 * jnp.log(acp / (1.0 - acp))


class CogVideoXDPMScheduler(CogVideoXDDIMScheduler):
    def set_timesteps(self, num_inference_steps: int) -> DPMSchedule:
        base = super().set_timesteps(num_inference_steps)
        ts = np.asarray(base.timesteps)
        prev_ts = ts - self.config.num_train_timesteps // num_inference_steps
        ok = (np.arange(len(ts)) > 0) & (prev_ts >= 0)
        return DPMSchedule(base.timesteps, base.alphas_cumprod_t,
                           base.alphas_cumprod_prev, jnp.asarray(ok))

    def step(self, schedule: DPMSchedule, model_output: jnp.ndarray, old_x0, step_index,
             sample: jnp.ndarray, noise: jnp.ndarray | None = None,
             have_history=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One SDE-DPM-Solver++(2M) update. ``old_x0`` is the previous step's returned
        x0 (ignored where ``second_order_ok`` is False — pass anything, e.g. zeros, at
        the first step). ``noise=None`` takes the deterministic mean update (z = 0).
        ``have_history``: optional extra bool guard for loops that do not start at
        schedule index 0 (V2V SDEdit starts mid-schedule with no x0 history — the
        reference's ``old_pred_original_sample is None`` branch).
        Returns (prev_sample, x0)."""
        a_t = schedule.alphas_cumprod_t[step_index]
        a_prev = schedule.alphas_cumprod_prev[step_index]
        x = sample.astype(jnp.float32)
        v = model_output.astype(jnp.float32)
        if self.config.prediction_type == "v_prediction":
            x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1.0 - a_t) * v
        elif self.config.prediction_type == "epsilon":
            x0 = (x - jnp.sqrt(1.0 - a_t) * v) / jnp.sqrt(a_t)
        else:
            raise ValueError(self.config.prediction_type)

        eps = jnp.finfo(jnp.float32).tiny
        h = _lamb(jnp.maximum(a_prev, eps)) - _lamb(a_t)  # a_prev=1 -> h=inf (final)
        em2h = jnp.exp(-2.0 * h)
        mult_x = jnp.sqrt((1.0 - a_prev) / (1.0 - a_t)) * jnp.exp(-h)
        mult_x0 = jnp.sqrt(a_prev) * (1.0 - em2h)
        mult_noise = jnp.sqrt(1.0 - a_prev) * jnp.sqrt(1.0 - em2h)

        # 2M history correction (guard r for the masked-out first/final steps)
        a_back = schedule.alphas_cumprod_t[jnp.maximum(step_index - 1, 0)]
        h_last = _lamb(a_t) - _lamb(a_back)
        ok = schedule.second_order_ok[step_index]
        if have_history is not None:
            ok = jnp.logical_and(ok, have_history)
        r = jnp.where(ok, h_last / jnp.where(ok, h, 1.0), 1.0)
        old = old_x0.astype(jnp.float32) if old_x0 is not None else jnp.zeros_like(x0)
        denoised = jnp.where(ok, (1.0 + 1.0 / (2.0 * r)) * x0 - old / (2.0 * r), x0)

        prev = mult_x * x + mult_x0 * denoised
        if noise is not None:
            prev = prev + mult_noise * noise.astype(jnp.float32)
        return prev.astype(sample.dtype), x0.astype(sample.dtype)
