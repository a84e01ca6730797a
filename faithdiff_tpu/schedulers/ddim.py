"""DDIM scheduler (deterministic eta=0 path; eta>0 supported with a key)."""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig
from .common import alphas_cumprod, spaced_timesteps


class DDIMState(NamedTuple):
    timesteps: jax.Array
    num_inference_steps: int
    init_noise_sigma: jax.Array


class DDIMScheduler:
    order = 1

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        self._alphas_cumprod = jnp.asarray(alphas_cumprod(cfg).astype(np.float32))
        self.final_alpha_cumprod = jnp.float32(1.0)

    def set_timesteps(self, num_inference_steps: int) -> DDIMState:
        ts = spaced_timesteps(self.cfg, num_inference_steps)
        return DDIMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            num_inference_steps=num_inference_steps,
            init_noise_sigma=jnp.float32(1.0),
        )

    def scale_model_input(self, state, sample, step_index):
        return sample

    def add_noise(self, original_samples, noise, timesteps):
        ac = self._alphas_cumprod[timesteps]
        while ac.ndim < original_samples.ndim:
            ac = ac[..., None]
        out = (
            jnp.sqrt(ac) * original_samples.astype(jnp.float32)
            + jnp.sqrt(1.0 - ac) * noise.astype(jnp.float32)
        )
        return out.astype(original_samples.dtype)

    def step(
        self,
        state: DDIMState,
        model_output: jax.Array,
        step_index: jax.Array,
        sample: jax.Array,
        eta: float = 0.0,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        t = state.timesteps[step_index]
        prev_t = t - cfg.num_train_timesteps // state.num_inference_steps

        ac_t = self._alphas_cumprod[t]
        ac_prev = jnp.where(
            prev_t >= 0, self._alphas_cumprod[jnp.maximum(prev_t, 0)],
            self.final_alpha_cumprod,
        )
        beta_prod_t = 1.0 - ac_t

        sample32 = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        pred_x0 = (sample32 - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(ac_t)
        if cfg.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

        variance = (1.0 - ac_prev) / (1.0 - ac_t) * (1.0 - ac_t / ac_prev)
        std = eta * jnp.sqrt(jnp.clip(variance, 0))
        dir_xt = jnp.sqrt(jnp.clip(1.0 - ac_prev - std ** 2, 0)) * eps
        prev = jnp.sqrt(ac_prev) * pred_x0 + dir_xt
        if eta > 0 and key is not None:
            prev = prev + std * jax.random.normal(key, sample.shape, jnp.float32)
        return prev.astype(sample.dtype)
