"""Training math utilities.

Capability-equivalent to `/root/reference/FaithDiff/training_utils.py:40-313`:
- `compute_snr` + min-SNR loss weighting (Hang et al., `:60-139`)
- DREAM latent rectification (`:141-192`)
- SD3-style timestep-density sampling and loss weighting (`:250-287`)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..schedulers import DDPMScheduler


def compute_snr(scheduler: DDPMScheduler, timesteps: jax.Array) -> jax.Array:
    """SNR(t) = alpha_bar / (1 - alpha_bar) (`training_utils.py:60`)."""
    ac = scheduler.alphas_cumprod[timesteps]
    return ac / (1.0 - ac)


def min_snr_weight(
    scheduler: DDPMScheduler, timesteps: jax.Array, gamma: float = 5.0,
    prediction_type: str = "epsilon",
) -> jax.Array:
    """min-SNR-gamma loss weights."""
    snr = compute_snr(scheduler, timesteps)
    w = jnp.minimum(snr, gamma)
    if prediction_type == "epsilon":
        return w / jnp.maximum(snr, 1e-8)
    if prediction_type == "v_prediction":
        return w / (snr + 1.0)
    raise ValueError(prediction_type)


def dream_rectification(
    scheduler: DDPMScheduler,
    noisy_latents: jax.Array,
    timesteps: jax.Array,
    noise: jax.Array,
    eps_pred: jax.Array,
    dream_detail_preservation: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """DREAM (arXiv 2312.00210) training rectification
    (`training_utils.py:141-192`, epsilon prediction): push the noisy input
    and target along the model's own error direction, scaled by
    sqrt(SNR)^p."""
    ac = scheduler.alphas_cumprod[timesteps]
    while ac.ndim < noisy_latents.ndim:
        ac = ac[..., None]
    sqrt_one_minus = jnp.sqrt(1.0 - ac)
    dream_lambda = (ac / (1.0 - ac)) ** (0.5 * dream_detail_preservation)

    delta = jax.lax.stop_gradient(noise - eps_pred)
    delta = delta * dream_lambda
    new_noisy = noisy_latents + sqrt_one_minus * delta
    new_target = noise + delta
    return new_noisy, new_target


def sd3_timestep_density(
    key: jax.Array, batch: int,
    weighting_scheme: str = "logit_normal",
    logit_mean: float = 0.0, logit_std: float = 1.0,
    mode_scale: float = 1.29,
) -> jax.Array:
    """Sample u in (0,1) with the SD3 density (`training_utils.py:250-270`)."""
    if weighting_scheme == "logit_normal":
        u = jax.random.normal(key, (batch,)) * logit_std + logit_mean
        return jax.nn.sigmoid(u)
    if weighting_scheme == "mode":
        u = jax.random.uniform(key, (batch,))
        return 1.0 - u - mode_scale * (jnp.cos(jnp.pi * u / 2) ** 2 - 1 + u)
    return jax.random.uniform(key, (batch,))


def sd3_loss_weighting(
    weighting_scheme: str, sigmas: jax.Array
) -> jax.Array:
    """SD3 loss weights (`training_utils.py:272-287`)."""
    if weighting_scheme == "sigma_sqrt":
        return (sigmas ** -2.0).astype(jnp.float32)
    if weighting_scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas ** 2
        return 2.0 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)
