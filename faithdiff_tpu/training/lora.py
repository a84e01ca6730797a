"""LoRA: low-rank adapters as a functional pytree overlay.

The reference carries three LoRA surfaces (all torch/peft):
- `unet_lora_state_dict` export (`/root/reference/FaithDiff/training_utils.py:195`)
- LoRA merge in the LLaVA builder (`/root/reference/llava/model/builder.py:48-90`)
- a LoRA finetune path (`/root/reference/llava/train/train.py` lora_r/lora_alpha args)

TPU-native design: LoRA is a SEPARATE params pytree mirroring the base
tree's structure at the adapted kernels; the effective weight is
``w + (alpha / rank) * A @ B``, computed at merge time for inference or
inside the loss for training (base under ``stop_gradient``) — no module
surgery, no traced-module state.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# attention + MLP projections across the UNet (to_*), the LLaMA captioner
# (*_proj), and the transformer proj in/out — the reference's peft targets
DEFAULT_TARGETS = (
    "to_q", "to_k", "to_v", "to_out",
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
    "proj_in", "proj_out",
)


def init_lora(
    params: Any,
    rank: int,
    rng: jax.Array,
    targets: Sequence[str] = DEFAULT_TARGETS,
    alpha: Optional[float] = None,
) -> Any:
    """Build a LoRA tree for every 2-D ``kernel`` under a target-named node.

    A: [in, rank] ~ N(0, 1/rank); B: [rank, out] zeros (standard LoRA init:
    the adapter starts as identity). The returned tree nests exactly like
    `params` but contains only adapted nodes, each
    ``{"lora_A": ..., "lora_B": ...}``.
    """
    alpha = float(alpha if alpha is not None else rank)
    keys = iter(jax.random.split(rng, 4096))

    def walk(node, name=""):
        if not isinstance(node, dict):
            return None
        if name in targets and "kernel" in node and node["kernel"].ndim == 2:
            cin, cout = node["kernel"].shape
            a = jax.random.normal(next(keys), (cin, rank),
                                  jnp.float32) / np.sqrt(rank)
            return {"lora_A": a, "lora_B": jnp.zeros((rank, cout),
                                                     jnp.float32)}
        out = {}
        for k, v in node.items():
            sub = walk(v, k)
            if sub:
                out[k] = sub
        return out or None

    tree = walk(params) or {}
    return {"_alpha": jnp.asarray(alpha, jnp.float32), **tree}


def _scale(lora: Any) -> jax.Array:
    rank = None

    def find_rank(node):
        nonlocal rank
        if isinstance(node, dict):
            if "lora_A" in node:
                rank = node["lora_A"].shape[1]
            else:
                for v in node.values():
                    find_rank(v)

    find_rank(lora)
    alpha = lora.get("_alpha", jnp.asarray(float(rank or 1)))
    return alpha / (rank or 1)


def merge_lora(params: Any, lora: Any, scale: Optional[float] = None) -> Any:
    """Return params with ``kernel += scale * A @ B`` at each adapted node
    (the builder's merge-and-unload, `llava/model/builder.py:86-90`)."""
    s = _scale(lora) if scale is None else scale

    def walk(p, l):
        if l is None or not isinstance(p, dict):
            return p
        if "lora_A" in l:
            delta = (l["lora_A"] @ l["lora_B"]) * s
            kernel = p["kernel"]
            return {**p, "kernel":
                    (kernel.astype(jnp.float32) + delta).astype(kernel.dtype)}
        return {k: walk(v, l.get(k)) if isinstance(l, dict) else v
                for k, v in p.items()}

    return walk(params, {k: v for k, v in lora.items() if k != "_alpha"})


def count_lora_modules(lora: Any) -> int:
    n = 0

    def walk(node):
        nonlocal n
        if isinstance(node, dict):
            if "lora_A" in node:
                n += 1
            else:
                for v in node.values():
                    walk(v)

    walk(lora)
    return n


def make_lora_train_step(
    loss_from_params: Callable[[Any, Any], jax.Array],
    base_params: Any,
    tx: optax.GradientTransformation,
) -> Callable:
    """Generic LoRA finetune step: only the LoRA tree receives gradients;
    the base is a frozen closure constant (ZeRO-style sharding of the tiny
    adapter state is unnecessary)."""

    def loss_fn(lora, batch):
        params = merge_lora(jax.lax.stop_gradient(base_params), lora)
        return loss_from_params(params, batch)

    def step(lora, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(lora, batch)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, {"loss": loss,
                                 "grad_norm": optax.global_norm(grads)}

    return step


# ---------------------------------------------------------------------------
# torch/peft interchange
# ---------------------------------------------------------------------------

def lora_torch_state_dict(lora: Any,
                          prefix: str = "") -> Dict[str, np.ndarray]:
    """Export to peft-style keys: ``{path}.lora_A.weight`` [rank, in] and
    ``{path}.lora_B.weight`` [out, rank] (torch [out, in] layout), the
    format `unet_lora_state_dict` / LLaVA LoRA checkpoints use."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if not isinstance(node, dict):
            return
        if "lora_A" in node:
            key = ".".join(path)
            out[f"{prefix}{key}.lora_A.weight"] = np.asarray(node["lora_A"]).T
            out[f"{prefix}{key}.lora_B.weight"] = np.asarray(node["lora_B"]).T
            return
        for k, v in node.items():
            if k == "_alpha":
                continue
            # flax list-index fusion back to torch dots: layers_0 -> layers.0
            parts = k.rsplit("_", 1)
            if len(parts) == 2 and parts[1].isdigit():
                walk(v, path + [parts[0], parts[1]])
            else:
                walk(v, path + [k])

    walk(lora, [])
    return out


def load_peft_lora(state_dict, alpha: Optional[float] = None) -> Any:
    """peft-style LoRA state dict -> our LoRA tree (the builder's
    load-LoRA-then-merge path)."""
    from ..utils.convert import _rename_parts, _set, _to_numpy

    tree: Dict[str, Any] = {}
    rank = 1
    for key, value in state_dict.items():
        key = key.replace("base_model.model.", "")
        if ".lora_A.weight" in key:
            path = _rename_parts(key.replace(".lora_A.weight", "").split("."))
            arr = _to_numpy(value).T          # [in, rank]
            rank = arr.shape[1]
            _set(tree, tuple(path) + ("lora_A",), arr)
        elif ".lora_B.weight" in key:
            path = _rename_parts(key.replace(".lora_B.weight", "").split("."))
            _set(tree, tuple(path) + ("lora_B",), _to_numpy(value).T)
    tree["_alpha"] = jnp.asarray(float(alpha if alpha is not None else rank),
                                 jnp.float32)
    return tree
