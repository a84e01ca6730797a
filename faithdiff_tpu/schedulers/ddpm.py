"""DDPM scheduler.

Used by the reference for (a) training-time `add_noise`
(`/root/reference/train_SDXL_stage_1.py:887`) and (b) the `start_point='lr'`
initialisation that noises the LR latent to t=999
(`/root/reference/FaithDiff/pipelines/pipeline_FaithDiff_tlc.py:1271-1276`).
Also usable as the inference scheduler.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig
from .common import alphas_cumprod, spaced_timesteps


class DDPMState(NamedTuple):
    timesteps: jax.Array          # [S] int32, descending
    num_inference_steps: int
    init_noise_sigma: jax.Array   # scalar (1.0)


class DDPMScheduler:
    order = 1

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        ac = alphas_cumprod(cfg).astype(np.float32)
        self._alphas_cumprod = jnp.asarray(ac)

    @property
    def alphas_cumprod(self) -> jax.Array:
        return self._alphas_cumprod

    def set_timesteps(self, num_inference_steps: int) -> DDPMState:
        ts = spaced_timesteps(self.cfg, num_inference_steps)
        return DDPMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            num_inference_steps=num_inference_steps,
            init_noise_sigma=jnp.float32(1.0),
        )

    def scale_model_input(
        self, state: DDPMState, sample: jax.Array, step_index: jax.Array
    ) -> jax.Array:
        return sample

    def add_noise(
        self,
        original_samples: jax.Array,
        noise: jax.Array,
        timesteps: jax.Array,
    ) -> jax.Array:
        """q(x_t | x_0): sqrt(a_t) x0 + sqrt(1-a_t) eps. fp32 accumulate."""
        ac = self._alphas_cumprod[timesteps]
        while ac.ndim < original_samples.ndim:
            ac = ac[..., None]
        out = (
            jnp.sqrt(ac) * original_samples.astype(jnp.float32)
            + jnp.sqrt(1.0 - ac) * noise.astype(jnp.float32)
        )
        return out.astype(original_samples.dtype)

    def get_velocity(
        self, sample: jax.Array, noise: jax.Array, timesteps: jax.Array
    ) -> jax.Array:
        """v-prediction target: sqrt(a) eps - sqrt(1-a) x0."""
        ac = self._alphas_cumprod[timesteps]
        while ac.ndim < sample.ndim:
            ac = ac[..., None]
        v = jnp.sqrt(ac) * noise.astype(jnp.float32) - jnp.sqrt(1.0 - ac) * sample.astype(jnp.float32)
        return v.astype(sample.dtype)

    def step(
        self,
        state: DDPMState,
        model_output: jax.Array,
        step_index: jax.Array,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Ancestral DDPM step (variance_type fixed_small, epsilon pred)."""
        cfg = self.cfg
        t = state.timesteps[step_index]
        prev_t = t - cfg.num_train_timesteps // state.num_inference_steps

        ac_t = self._alphas_cumprod[t]
        ac_prev = jnp.where(prev_t >= 0, self._alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_prod_t = 1.0 - ac_t
        beta_prod_prev = 1.0 - ac_prev
        current_alpha = ac_t / ac_prev
        current_beta = 1.0 - current_alpha

        sample32 = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        pred_x0 = (sample32 - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(ac_t)
        if cfg.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

        pred_x0_coeff = jnp.sqrt(ac_prev) * current_beta / beta_prod_t
        sample_coeff = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
        prev = pred_x0_coeff * pred_x0 + sample_coeff * sample32

        variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta, 1e-20)
        if key is not None:
            noise = jax.random.normal(key, sample.shape, jnp.float32)
            prev = jnp.where(t > 0, prev + jnp.sqrt(variance) * noise, prev)
        return prev.astype(sample.dtype)
