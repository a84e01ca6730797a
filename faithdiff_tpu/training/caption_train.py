"""Captioner (LLaVA-style) finetuning step.

Capability-equivalent to the reference's LLaVA trainer
(`/root/reference/llava/train/train.py:788+`, `llava_trainer.py`):
- next-token cross-entropy over the answer span, image tokens and prompt
  masked with IGNORE_INDEX (-100, `llava/constants.py`)
- trainable-group selection: "projector" (adapter pretrain,
  `--tune_mm_mlp_adapter`), "full" finetune, or "lm" (frozen tower)
- separate projector LR (`llava_trainer.py:150-228`)

TPU-first: one pjit-able step over fixed-shape multimodal batches; the
vision tower runs frozen under stop_gradient unless group == "full".
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

IGNORE_INDEX = -100


class CaptionTrainState(NamedTuple):
    step: jax.Array
    params: Any          # {"llama": ..., "vision": ..., "projector": ...}
    opt_state: Any


def make_caption_optimizer(
    params: Any,
    trainable: str = "projector",     # "projector" | "lm" | "full"
    learning_rate: float = 2e-5,
    projector_lr: float = 2e-5,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    def label(group):
        if trainable == "projector":
            return "train" if group == "projector" else "freeze"
        if trainable == "lm":
            return "freeze" if group == "vision" else (
                "proj" if group == "projector" else "train")
        return "proj" if group == "projector" else "train"

    labels = {g: jax.tree.map(lambda _: label(g), params[g]) for g in params}
    adamw = lambda lr: optax.adamw(lr, weight_decay=weight_decay)  # noqa
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.multi_transform(
            {"train": adamw(learning_rate), "proj": adamw(projector_lr),
             "freeze": optax.set_to_zero()},
            labels,
        ),
    )


def make_caption_train_step(
    llama_apply: Callable,     # (params, embeds, positions) -> logits
    embed_apply: Callable,     # (params, ids) -> embeds
    vision_apply: Callable,    # (params, pixels) -> patch feats
    projector_apply: Callable,  # (params, feats) -> lm-dim embeds
    tx: optax.GradientTransformation,
    image_token_pos: int,
    num_image_tokens: int,
    freeze_vision: bool = True,
) -> Callable:
    """Returns step(state, batch) -> (state, metrics).

    batch: input_ids [B, S] (with a placeholder span of `num_image_tokens`
    starting at `image_token_pos`), labels [B, S] (IGNORE_INDEX outside the
    answer), pixels [B, H, W, 3].
    """

    def loss_fn(params, batch):
        ids = batch["input_ids"]
        b, s = ids.shape
        embeds = embed_apply({"params": params["llama"]}, ids)
        feats = vision_apply({"params": params["vision"]}, batch["pixels"])
        if freeze_vision:
            feats = jax.lax.stop_gradient(feats)
        img_embeds = projector_apply({"params": params["projector"]}, feats)
        img_embeds = img_embeds.astype(embeds.dtype)
        # splice image embeddings over the placeholder span
        embeds = jax.lax.dynamic_update_slice(
            embeds, img_embeds, (0, image_token_pos, 0))

        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        logits, _ = llama_apply({"params": params["llama"]}, embeds, positions)
        # next-token prediction
        logits = logits[:, :-1]
        labels = batch["labels"][:, 1:]
        mask = labels != IGNORE_INDEX
        safe_labels = jnp.where(mask, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
        loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
        return loss

    def step(state: CaptionTrainState, batch) -> Tuple[CaptionTrainState, dict]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            CaptionTrainState(state.step + 1, params, opt_state),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    return step
