"""Two-stage FaithDiff training: pjit data-parallel train step.

Capability-equivalent to `/root/reference/train_SDXL_stage_1.py` /
`train_SDXL_stage_2.py` (SURVEY.md §2.6):
- stage 1 (alignment): train ONLY condition_embedding +
  information_transformer(+spatial_ch_projs) (`train_SDXL_stage_1.py:696-699`)
- stage 2 (joint): denoise_encoder at `vis_learning_rate`, full UNet at
  `learning_rate` (`train_SDXL_stage_2.py:703-714`)
- loss: L1 on epsilon (`train_SDXL_stage_1.py:910`), uniform timesteps,
  noise offset 0.02 per channel (`:875-878`), grad clip 1.0, cosine LR with
  warmup, interval-gated EMA (`:928-929`)

TPU redesign: Accelerate/DeepSpeed ZeRO-2 becomes a `data`-axis mesh — the
batch is sharded, gradients psum over ICI (inserted by XLA), and Adam
moments are sharded over `data` where divisible (`parallel.mesh
.shard_leading_divisible`). Text embeddings are precomputed outside the step
(the text towers are frozen — recomputing them per step, as the reference
does, wastes FLOPs).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import SchedulerConfig, TrainConfig
from ..schedulers import DDPMScheduler
from .ema import EMAState, ema_init, ema_update


class TrainState(NamedTuple):
    step: jax.Array
    params: Any              # {"unet": ..., "denoise_encoder": ...}
    opt_state: Any
    ema: EMAState


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=cfg.lr_warmup_steps,
            decay_steps=max(cfg.max_train_steps, cfg.lr_warmup_steps + 1),
            end_value=0.0,
        )
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    raise ValueError(cfg.lr_scheduler)


_ADAPTER_KEYS = ("condition_embedding", "information_transformer")


def param_labels(params: Any, stage: int) -> Any:
    """Label each leaf for optax.multi_transform.

    stage 1: adapters -> "train", everything else -> "freeze"
    stage 2: denoise_encoder -> "vis", unet -> "train"
    """
    def label_unet(path_key):
        if stage == 1:
            return "train" if path_key in _ADAPTER_KEYS else "freeze"
        return "train"

    labels = {
        "unet": {
            k: jax.tree.map(lambda _: label_unet(k), v)
            for k, v in params["unet"].items()
        },
        "denoise_encoder": jax.tree.map(
            lambda _: ("freeze" if stage == 1 else "vis"),
            params["denoise_encoder"],
        ),
    }
    return labels


def partition_params(params: Any, labels: Any) -> Tuple[Any, Any]:
    """Split params into (trainable, frozen) trees with None (= empty
    subtree) at the other partition's slots.

    Differentiating and EMA-tracking ONLY the trainable partition is what
    makes stage-1 fit one chip: `jax.grad` over the full tree materialises
    a gradient buffer per frozen SDXL weight (~5 GB bf16) and the fp32 EMA
    shadow doubles that again — measured as a 20.1 GB HBM OOM at 512px
    batch 2 before this split."""
    train = jax.tree.map(
        lambda p, l: p if l != "freeze" else None, params, labels)
    frozen = jax.tree.map(
        lambda p, l: p if l == "freeze" else None, params, labels)
    return train, frozen


def combine_params(train: Any, frozen: Any) -> Any:
    """Inverse of `partition_params`."""
    return jax.tree.map(
        lambda t, f: f if t is None else t, train, frozen,
        is_leaf=lambda x: x is None)


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    """Optimizer over the TRAINABLE partition only (frozen leaves carry no
    optimizer state, no updates, no gradients)."""
    lr = make_lr_schedule(cfg)
    vis_lr = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.vis_learning_rate,
        warmup_steps=cfg.lr_warmup_steps,
        decay_steps=max(cfg.max_train_steps, cfg.lr_warmup_steps + 1),
        end_value=0.0,
    )

    def adamw(sched):
        return optax.adamw(
            sched, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay,
        )

    labels = param_labels(params, cfg.stage)
    train_labels, _ = partition_params(labels, labels)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(
            {"train": adamw(lr), "vis": adamw(vis_lr)},
            train_labels,
        ),
    )
    if cfg.grad_accum > 1:
        # micro-batch gradient accumulation (`accelerate_config.yaml:9`):
        # grads average across `grad_accum` step calls, the inner optimizer
        # applies every grad_accum-th call. The accumulator lives in
        # opt_state, so the runner's ZeRO sharding covers it (1.3 GB/chip
        # instead of a 10.4 GB replicated fp32 grad tree on v5e-8).
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def init_train_state(cfg: TrainConfig, unet_params, denoise_encoder_params
                     ) -> Tuple[TrainState, optax.GradientTransformation]:
    params = {
        "unet": unet_params["params"],
        "denoise_encoder": denoise_encoder_params["params"],
    }
    tx = make_optimizer(cfg, params)
    labels = param_labels(params, cfg.stage)
    train, _ = partition_params(params, labels)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(train),
        ema=ema_init(train),
    ), tx


def make_train_step(
    unet_apply: Callable,
    denoise_encoder_apply: Callable,
    vae_encode: Callable,       # (vae_params, image, key) -> scaled latents
    vae_params: Any,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    scheduler_config: SchedulerConfig = SchedulerConfig(),
) -> Callable:
    """Returns step(state, batch, key, vae_params=...) -> (state, metrics).

    batch: dict with
      hr [B, H, W, 3] in [-1, 1], lq [B, H, W, 3] in [-1, 1],
      prompt_embeds [B, 77, 2048], pooled_embeds [B, 1280],
      add_time_ids [B, 6]

    `vae_params` is exposed as an (defaulted) argument so AOT analysis can
    lower the step with fully-abstract inputs (no multi-GB closure
    constants); normal callers never pass it.
    """
    ddpm = DDPMScheduler(scheduler_config)
    n_train_t = scheduler_config.num_train_timesteps

    def loss_fn(params, batch, key, vp):
        k_vae, k_noise, k_off, k_t = jax.random.split(key, 4)
        latents = vae_encode(vp, batch["hr"], k_vae)
        latents = jax.lax.stop_gradient(latents)
        b = latents.shape[0]
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        if cfg.noise_offset > 0:
            noise = noise + cfg.noise_offset * jax.random.normal(
                k_off, (b, 1, 1, latents.shape[-1]), jnp.float32)
        t = jax.random.randint(k_t, (b,), 0, n_train_t)
        noisy = ddpm.add_noise(latents, noise, t)

        lq_feats = denoise_encoder_apply(
            {"params": params["denoise_encoder"]}, batch["lq"])
        eps_pred = unet_apply(
            {"params": params["unet"]}, noisy, t.astype(jnp.float32),
            batch["prompt_embeds"], batch["pooled_embeds"],
            batch["add_time_ids"], lq_feats, True, None,
        )
        # L1 on epsilon (`train_SDXL_stage_1.py:910`), fp32 accumulation
        loss = jnp.mean(jnp.abs(
            eps_pred.astype(jnp.float32) - noise.astype(jnp.float32)))
        return loss

    def step(state: TrainState, batch, key,
             vae_params=vae_params) -> Tuple[TrainState, dict]:
        labels = param_labels(state.params, cfg.stage)
        train, frozen = partition_params(state.params, labels)

        def loss_from_train(train_part):
            return loss_fn(combine_params(train_part, frozen), batch, key,
                           vae_params)

        # gradients exist ONLY for the trainable partition — no frozen-leaf
        # gradient buffers ever materialise
        loss, grads = jax.value_and_grad(loss_from_train)(train)
        updates, opt_state = tx.update(grads, state.opt_state, train)
        train = optax.apply_updates(train, updates)
        params = combine_params(train, frozen)
        # EMA gates on OPTIMIZER steps (the reference's global_step,
        # `train_SDXL_stage_1.py:928-929`): with accumulation, `step`
        # counts micro-steps, so the interval scales by grad_accum — the
        # EMA sees the shadow params right after each interval-th update
        ema = ema_update(
            state.ema, train, state.step + 1,
            interval=cfg.ema_update_interval * cfg.grad_accum,
            decay=cfg.ema_decay,
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return step
