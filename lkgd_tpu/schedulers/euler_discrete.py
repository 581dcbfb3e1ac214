"""Euler-discrete (EDM) scheduler with Karras sigmas — TPU-native, functional.

Re-design of the reference scheduler
(`/root/reference/utils/scheduling_euler_discrete_karras_fix.py:133-557`) as a pure-functional
JAX component: the schedule is an immutable pytree computed once on the host
(`EulerDiscreteScheduler.set_timesteps`), and `step` is a pure function of
``(schedule, step_index, model_output, sample)`` so the whole sampling loop compiles under
``jax.lax.scan`` with a traced step index — no Python-side mutable ``_step_index`` state.

Math parity targets (reference file:line):
  * beta schedules + zero-terminal-SNR rescale            (:97-230)
  * ``set_timesteps`` linspace/leading/trailing spacing,
    linear/log-linear sigma interpolation, Karras rho=7   (:290-399)
  * continuous timesteps ``0.25 * log(sigma)`` for v-pred (:344-345)
  * ``scale_model_input`` = x / sqrt(sigma^2+1)           (:264-288)
  * Euler step with v-prediction EDM scalings             (:418-528)
  * sigma-indexed ``add_noise``                           (:530-553)
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EulerDiscreteConfig:
    """Static scheduler configuration (mirrors the reference's ConfigMixin fields)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"  # linear | scaled_linear | squaredcos_cap_v2
    prediction_type: str = "epsilon"  # epsilon | v_prediction | sample
    interpolation_type: str = "linear"  # linear | log_linear
    use_karras_sigmas: bool = False
    sigma_min: Optional[float] = None
    sigma_max: Optional[float] = None
    timestep_spacing: str = "linspace"  # linspace | leading | trailing
    timestep_type: str = "discrete"  # discrete | continuous
    steps_offset: int = 0
    rescale_betas_zero_snr: bool = False

    @classmethod
    def svd(cls) -> "EulerDiscreteConfig":
        """The Stable-Video-Diffusion scheduler config (img2vid / img2vid-xt)."""
        return cls(
            num_train_timesteps=1000,
            beta_start=0.00085,
            beta_end=0.012,
            beta_schedule="scaled_linear",
            prediction_type="v_prediction",
            interpolation_type="linear",
            use_karras_sigmas=True,
            sigma_min=0.002,
            sigma_max=700.0,
            timestep_spacing="leading",
            timestep_type="continuous",
            steps_offset=1,
        )


class Schedule(NamedTuple):
    """Immutable inference schedule: device arrays consumed inside jit/scan."""

    sigmas: jnp.ndarray  # (num_steps + 1,) float32; final entry is 0
    timesteps: jnp.ndarray  # (num_steps,) float32
    init_noise_sigma: jnp.ndarray  # scalar float32

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def _make_betas(config: EulerDiscreteConfig) -> np.ndarray:
    n = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, n, dtype=np.float64)
    elif config.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(config.beta_start**0.5, config.beta_end**0.5, n, dtype=np.float64) ** 2
        )
    elif config.beta_schedule == "squaredcos_cap_v2":
        t1 = np.arange(n, dtype=np.float64) / n
        t2 = (np.arange(n, dtype=np.float64) + 1) / n

        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = np.minimum(1 - alpha_bar(t2) / alpha_bar(t1), 0.999)
    else:
        raise NotImplementedError(f"beta_schedule={config.beta_schedule}")
    if config.rescale_betas_zero_snr:
        betas = _rescale_zero_terminal_snr(betas)
    return betas.astype(np.float64)


def _rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR rescale (reference :97-130; arXiv 2305.08891 alg. 1)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)
    a0, aT = alphas_bar_sqrt[0], alphas_bar_sqrt[-1]
    alphas_bar_sqrt = (alphas_bar_sqrt - aT) * (a0 / (a0 - aT))
    alphas_bar = alphas_bar_sqrt**2
    alphas = np.concatenate([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1.0 - alphas


def _training_sigmas(config: EulerDiscreteConfig) -> np.ndarray:
    """Ascending per-train-timestep sigmas: sqrt((1-abar)/abar)."""
    betas = _make_betas(config)
    alphas_cumprod = np.cumprod(1.0 - betas)
    if config.rescale_betas_zero_snr:
        alphas_cumprod[-1] = 2**-24  # avoid inf sigma
    return np.sqrt((1 - alphas_cumprod) / alphas_cumprod)


def _sigma_to_t(sigma: np.ndarray, log_sigmas: np.ndarray) -> np.ndarray:
    """Invert the sigma schedule to fractional train timesteps (reference :352-373)."""
    log_sigma = np.log(np.maximum(sigma, 1e-10))
    dists = log_sigma - log_sigmas[:, None]
    low_idx = np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(max=log_sigmas.shape[0] - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return ((1 - w) * low_idx + w * high_idx).reshape(np.shape(sigma))


def _convert_to_karras(
    in_sigmas: np.ndarray, num_inference_steps: int, sigma_min: Optional[float], sigma_max: Optional[float]
) -> np.ndarray:
    """Karras et al. 2022 noise schedule, rho = 7 (reference :376-399)."""
    sigma_min = sigma_min if sigma_min is not None else float(in_sigmas[-1])
    sigma_max = sigma_max if sigma_max is not None else float(in_sigmas[0])
    rho = 7.0
    ramp = np.linspace(0, 1, num_inference_steps)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho


class EulerDiscreteScheduler:
    """Host-side schedule factory + pure step functions.

    Usage::

        sched = EulerDiscreteScheduler(EulerDiscreteConfig.svd())
        schedule = sched.set_timesteps(25)                      # host, numpy
        x = noise * schedule.init_noise_sigma
        def body(x, i):
            inp = sched.scale_model_input(schedule, x, i)
            pred = model(inp, schedule.timesteps[i])
            x, x0 = sched.step(schedule, pred, i, x)
            return x, None
        x, _ = jax.lax.scan(body, x, jnp.arange(schedule.num_steps))
    """

    def __init__(self, config: EulerDiscreteConfig = EulerDiscreteConfig()):
        self.config = config
        self._train_sigmas = _training_sigmas(config)  # ascending, (T,)

    # ------------------------------------------------------------------ host
    def set_timesteps(self, num_inference_steps: int) -> Schedule:
        cfg = self.config
        n_train = cfg.num_train_timesteps
        if cfg.timestep_spacing == "linspace":
            timesteps = np.linspace(0, n_train - 1, num_inference_steps, dtype=np.float64)[::-1].copy()
        elif cfg.timestep_spacing == "leading":
            step_ratio = n_train // num_inference_steps
            timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.float64)
            timesteps += cfg.steps_offset
        elif cfg.timestep_spacing == "trailing":
            step_ratio = n_train / num_inference_steps
            timesteps = np.arange(n_train, 0, -step_ratio).round().astype(np.float64) - 1
        else:
            raise ValueError(f"timestep_spacing={cfg.timestep_spacing}")

        sigmas_full = self._train_sigmas  # ascending over train timesteps
        log_sigmas = np.log(sigmas_full)
        if cfg.interpolation_type == "linear":
            sigmas = np.interp(timesteps, np.arange(0, len(sigmas_full)), sigmas_full)
        elif cfg.interpolation_type == "log_linear":
            sigmas = np.exp(
                np.linspace(np.log(sigmas_full[-1]), np.log(sigmas_full[0]), num_inference_steps + 1)
            )
        else:
            raise ValueError(f"interpolation_type={cfg.interpolation_type}")

        if cfg.use_karras_sigmas:
            sigmas = _convert_to_karras(sigmas, num_inference_steps, cfg.sigma_min, cfg.sigma_max)
            timesteps = _sigma_to_t(sigmas, log_sigmas)

        if cfg.timestep_type == "continuous" and cfg.prediction_type == "v_prediction":
            ts = 0.25 * np.log(sigmas)
        else:
            ts = timesteps

        max_sigma = float(np.max(sigmas))
        if cfg.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = max_sigma
        else:
            init_noise_sigma = (max_sigma**2 + 1) ** 0.5

        return Schedule(
            sigmas=jnp.asarray(np.append(sigmas, 0.0), dtype=jnp.float32),
            timesteps=jnp.asarray(ts, dtype=jnp.float32),
            init_noise_sigma=jnp.asarray(init_noise_sigma, dtype=jnp.float32),
        )

    # ---------------------------------------------------------------- device
    def scale_model_input(self, schedule: Schedule, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        """x / sqrt(sigma^2 + 1) (reference :264-288). `step_index` may be traced."""
        sigma = schedule.sigmas[step_index]
        return sample / jnp.sqrt(sigma**2 + 1.0)

    def step(
        self,
        schedule: Schedule,
        model_output: jnp.ndarray,
        step_index,
        sample: jnp.ndarray,
        *,
        s_churn: float = 0.0,
        s_noise: float = 1.0,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One Euler (EDM) update. Returns ``(prev_sample, pred_original_sample)``.

        fp32 internally regardless of model dtype (reference :480-520). With the default
        ``s_churn=0`` this is the deterministic ODE step used by every reference pipeline.
        """
        dtype = model_output.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        sigma = schedule.sigmas[step_index]

        if s_churn > 0.0:
            if noise is None:
                raise ValueError("s_churn > 0 requires an explicit `noise` array")
            n_sigmas = schedule.sigmas.shape[0]
            gamma = min(s_churn / (n_sigmas - 1), 2**0.5 - 1)
            sigma_hat = sigma * (gamma + 1.0)
            sample = sample + noise.astype(jnp.float32) * s_noise * jnp.sqrt(
                jnp.maximum(sigma_hat**2 - sigma**2, 0.0)
            )
        else:
            sigma_hat = sigma

        pred = self.config.prediction_type
        if pred in ("original_sample", "sample"):
            pred_original = model_output
        elif pred == "epsilon":
            pred_original = sample - sigma_hat * model_output
        elif pred == "v_prediction":
            pred_original = model_output * (-sigma / jnp.sqrt(sigma**2 + 1.0)) + sample / (sigma**2 + 1.0)
        else:
            raise ValueError(f"prediction_type={pred}")

        derivative = (sample - pred_original) / sigma_hat
        dt = schedule.sigmas[step_index + 1] - sigma_hat
        prev_sample = sample + derivative * dt
        return prev_sample.astype(dtype), pred_original.astype(dtype)

    def add_noise(
        self,
        schedule: Schedule,
        original_samples: jnp.ndarray,
        noise: jnp.ndarray,
        step_indices: jnp.ndarray,
    ) -> jnp.ndarray:
        """x + sigma[i] * noise, sigma broadcast over trailing dims (reference :530-553).

        Unlike the reference, which looks indices up by timestep equality at run time, we
        take explicit integer ``step_indices`` into ``schedule.sigmas`` — the jit-friendly
        contract (the caller controls the timestep → index mapping).
        """
        sigma = schedule.sigmas[step_indices].astype(original_samples.dtype)
        sigma = sigma.reshape(sigma.shape + (1,) * (original_samples.ndim - sigma.ndim))
        return original_samples + noise * sigma

    def step_index_for_timestep(self, schedule: Schedule, timestep: float) -> int:
        """Host helper replicating the reference's `_init_step_index` (:401-416): the
        *second* matching index is used so img2img resume never skips a sigma."""
        ts = np.asarray(schedule.timesteps)
        candidates = np.nonzero(ts == timestep)[0]
        if len(candidates) == 0:
            raise ValueError(f"timestep {timestep} not in schedule")
        return int(candidates[1] if len(candidates) > 1 else candidates[0])


def config_from_diffusers_json(path: str) -> EulerDiscreteConfig:
    """Build a scheduler config from a diffusers scheduler_config.json (the reference's
    load_scheduler interop, utils/util.py:886)."""
    import json

    with open(path) as f:
        d = json.load(f)
    fields = {f.name for f in dataclasses.fields(EulerDiscreteConfig)}
    return EulerDiscreteConfig(**{k: v for k, v in d.items() if k in fields})
