"""Shared diffusion-schedule math.

Pure-functional replacements for the diffusers schedulers the reference
drives statefully (per-tile `scheduler.__dict__` deep-copies at
`/root/reference/FaithDiff/pipelines/pipeline_FaithDiff_tlc.py:1282,1331,1375`).
Here scheduler *state* is an explicit pytree so tiles can carry independent
state under `vmap`/`scan` without mutation.
"""
from __future__ import annotations

import numpy as np

from ..config import SchedulerConfig


def make_betas(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps,
                           dtype=np.float64)
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                        cfg.num_train_timesteps, dtype=np.float64) ** 2
        )
    if cfg.beta_schedule == "squaredcos_cap_v2":
        steps = np.arange(cfg.num_train_timesteps + 1, dtype=np.float64)
        t = steps / cfg.num_train_timesteps
        alpha_bar = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = 1.0 - alpha_bar[1:] / alpha_bar[:-1]
        return np.clip(betas, 0, 0.999)
    raise ValueError(f"unknown beta schedule {cfg.beta_schedule!r}")


def alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    return np.cumprod(1.0 - make_betas(cfg), axis=0)


def spaced_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Inference timesteps in descending order (diffusers semantics per
    `timestep_spacing`)."""
    n = cfg.num_train_timesteps
    if cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, n - 1, num_inference_steps, dtype=np.float64)[::-1]
        return np.round(ts).astype(np.int64)
    if cfg.timestep_spacing == "leading":
        step_ratio = n // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        return (ts + cfg.steps_offset).astype(np.int64)
    if cfg.timestep_spacing == "trailing":
        step_ratio = n / num_inference_steps
        ts = np.round(np.arange(n, 0, -step_ratio)) - 1
        return ts.astype(np.int64)
    raise ValueError(f"unknown timestep spacing {cfg.timestep_spacing!r}")
