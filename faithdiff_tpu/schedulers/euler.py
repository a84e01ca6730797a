"""Euler discrete scheduler (the SDXL default inference scheduler).

Pure-functional port of diffusers `EulerDiscreteScheduler` semantics, the
scheduler the reference pipeline loads from the SDXL repo
(`/root/reference/FaithDiff/create_FaithDiff_model.py:25-34`) and steps per
tile (`pipeline_FaithDiff_tlc.py:1373`).

State is a `EulerState` pytree; `step` is deterministic (the Karras s_churn
path is not used by the reference defaults) so stepping a batch of tiles is a
single vectorised call.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig
from .common import alphas_cumprod, spaced_timesteps


class EulerState(NamedTuple):
    timesteps: jax.Array        # [S] float32, descending
    sigmas: jax.Array           # [S+1] float32 (terminal 0 appended)
    num_inference_steps: int
    init_noise_sigma: jax.Array  # scalar


class EulerDiscreteScheduler:
    """Config holder with pure methods; all mutable data lives in EulerState."""

    order = 1

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        ac = alphas_cumprod(cfg)
        self._sigmas_train = np.sqrt((1.0 - ac) / ac)

    def set_timesteps(self, num_inference_steps: int) -> EulerState:
        cfg = self.cfg
        timesteps = spaced_timesteps(cfg, num_inference_steps).astype(np.float64)
        sigmas = np.interp(
            timesteps, np.arange(len(self._sigmas_train)), self._sigmas_train
        )
        if cfg.use_karras_sigmas:
            sigmas = self._karras_sigmas(sigmas, num_inference_steps)
            timesteps = np.array(
                [self._sigma_to_t(s) for s in sigmas], dtype=np.float64
            )
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        max_sigma = float(sigmas.max())
        if cfg.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = max_sigma
        else:
            init_noise_sigma = (max_sigma ** 2 + 1) ** 0.5
        return EulerState(
            timesteps=jnp.asarray(timesteps, jnp.float32),
            sigmas=jnp.asarray(sigmas),
            num_inference_steps=num_inference_steps,
            init_noise_sigma=jnp.float32(init_noise_sigma),
        )

    def _karras_sigmas(self, in_sigmas: np.ndarray, n: int) -> np.ndarray:
        sigma_min, sigma_max = in_sigmas[-1], in_sigmas[0]
        rho = 7.0
        ramp = np.linspace(0, 1, n)
        min_inv_rho = sigma_min ** (1 / rho)
        max_inv_rho = sigma_max ** (1 / rho)
        return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho

    def _sigma_to_t(self, sigma: float) -> float:
        log_sigma = np.log(np.maximum(sigma, 1e-10))
        log_sigmas = np.log(self._sigmas_train)
        dists = log_sigma - log_sigmas[:, None]
        low_idx = (
            np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(
                max=len(log_sigmas) - 2
            )
        )[0]
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = np.clip((low - log_sigma) / (low - high), 0, 1)
        return float((1 - w) * low_idx + w * high_idx)

    def scale_model_input(
        self, state: EulerState, sample: jax.Array, step_index: jax.Array
    ) -> jax.Array:
        sigma = state.sigmas[step_index]
        return (sample / jnp.sqrt(sigma ** 2 + 1)).astype(sample.dtype)

    def step(
        self,
        state: EulerState,
        model_output: jax.Array,
        step_index: jax.Array,
        sample: jax.Array,
    ) -> jax.Array:
        """One deterministic Euler step: x += eps * (sigma_next - sigma).

        epsilon-prediction only (the FaithDiff training target,
        `/root/reference/train_SDXL_stage_1.py:910`).
        """
        sigma = state.sigmas[step_index]
        sigma_next = state.sigmas[step_index + 1]
        dt = (sigma_next - sigma).astype(jnp.float32)
        prev = sample.astype(jnp.float32) + model_output.astype(jnp.float32) * dt
        return prev.astype(sample.dtype)

    def add_noise(
        self,
        state: EulerState,
        original_samples: jax.Array,
        noise: jax.Array,
        step_index: jax.Array,
    ) -> jax.Array:
        sigma = state.sigmas[step_index]
        return (original_samples + noise * sigma).astype(original_samples.dtype)


class EulerAncestralDiscreteScheduler(EulerDiscreteScheduler):
    """Ancestral variant: stochastic step with per-step noise.

    Step math follows diffusers `EulerAncestralDiscreteScheduler`; the caller
    threads a PRNG key (per tile if desired — mirrors the reference's
    independent per-tile scheduler state).
    """

    def step(
        self,
        state: EulerState,
        model_output: jax.Array,
        step_index: jax.Array,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        sigma = state.sigmas[step_index]
        sigma_to = state.sigmas[step_index + 1]
        sample32 = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        sigma_up = jnp.sqrt(
            jnp.clip(sigma_to ** 2 * (sigma ** 2 - sigma_to ** 2) / sigma ** 2, 0)
        )
        sigma_down = jnp.sqrt(jnp.clip(sigma_to ** 2 - sigma_up ** 2, 0))
        dt = sigma_down - sigma
        prev = sample32 + eps * dt
        if key is not None:
            noise = jax.random.normal(key, sample.shape, jnp.float32)
            prev = prev + noise * sigma_up
        return prev.astype(sample.dtype)
