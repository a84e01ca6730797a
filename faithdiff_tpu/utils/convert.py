"""Checkpoint conversion: torch/diffusers/transformers state dicts -> flax
param pytrees.

Covers the checkpoint surface of the reference factory
(`/root/reference/FaithDiff/create_FaithDiff_model.py:11-37`):
- diffusers SDXL UNet (`unet/diffusion_pytorch_model.safetensors`)
- diffusers AutoencoderKL (sdxl-vae-fp16-fix)
- transformers CLIP text towers
- the flat `FaithDiff.bin` whose keys mix the core UNet with 5 extra module
  namespaces, split-loaded exactly like the reference custom
  `load_state_dict` (`unet_2d_condition_vae_extension.py:444-478`)

Conventions converted:
- conv kernels OIHW -> HWIO
- linear weights [out, in] -> [in, out]
- norm `weight` -> `scale`
- `nn.MultiheadAttention` packed `in_proj_weight` -> single `in_proj` Dense
- `to_out.0` (Linear+Dropout ModuleList) -> `to_out`
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_INDEXED = (
    "down_blocks", "up_blocks", "resnets", "attentions", "transformer_blocks",
    "downsamplers", "upsamplers", "layers", "net",
)


def _rename_parts(parts):
    """Fuse list indices into flax module names: down_blocks.0 -> down_blocks_0."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _INDEXED and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        # torch bf16/fp16 -> fp32 numpy (params are stored fp32 in flax)
        import torch

        if t.dtype in (torch.bfloat16, torch.float16):
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def _convert_entry(parts, tensor: np.ndarray):
    """Map one (torch key, tensor) to (flax path, array)."""
    leaf = parts[-1]
    prefix = parts[:-1]

    # ModuleList Linear: to_out.0 / mlp Sequential names
    if len(prefix) >= 2 and prefix[-1] == "0" and prefix[-2] == "to_out":
        prefix = prefix[:-2] + ["to_out"]

    if leaf == "in_proj_weight":          # torch MHA packed qkv
        return prefix + ["in_proj", "kernel"], tensor.T
    if leaf == "in_proj_bias":
        return prefix + ["in_proj", "bias"], tensor

    if leaf == "weight":
        if tensor.ndim == 4:              # conv OIHW -> HWIO
            return prefix + ["kernel"], tensor.transpose(2, 3, 1, 0)
        if tensor.ndim == 2:              # linear
            return prefix + ["kernel"], tensor.T
        return prefix + ["scale"], tensor  # norm weight
    if leaf == "bias":
        return prefix + ["bias"], tensor
    raise KeyError(f"unhandled leaf {'.'.join(parts)}")


def convert_state_dict(
    state_dict: Mapping[str, Any],
    rename: Dict[str, str] | None = None,
    skip: Tuple[str, ...] = (),
) -> Dict[str, Any]:
    """Generic torch -> flax conversion with optional regex renames applied
    to the torch key before structural mapping."""
    tree: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        if any(re.match(s, key) for s in skip):
            continue
        if rename:
            for pat, repl in rename.items():
                key = re.sub(pat, repl, key)
        arr = _to_numpy(tensor)
        parts = _rename_parts(key.split("."))
        path, value = _convert_entry(parts, arr)
        _set(tree, tuple(path), value)
    return tree


# ---------------------------------------------------------------------------
# model-specific conversions
# ---------------------------------------------------------------------------

_UNET_RENAMES = {
    # FaithDiff extras (reference module attrs -> our module tree)
    r"^information_transformer_layes\.(\d+)\.attn\.": r"information_transformer.layers.\1.",
    r"^information_transformer_layes\.(\d+)\.ln_(\d)\.": r"information_transformer.layers.\1.ln_\2.",
    r"^information_transformer_layes\.(\d+)\.mlp\.c_fc\.": r"information_transformer.layers.\1.mlp_c_fc.",
    r"^information_transformer_layes\.(\d+)\.mlp\.c_proj\.": r"information_transformer.layers.\1.mlp_c_proj.",
    r"^spatial_ch_projs\.": r"information_transformer.spatial_ch_projs.",
}


def convert_unet(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a diffusers SDXL UNet state dict — including FaithDiff.bin
    extras if present — to our `UNet2DConditionModel` params."""
    renamed = {}
    for k, v in state_dict.items():
        nk = k
        for pat, repl in _UNET_RENAMES.items():
            nk = re.sub(pat, repl, nk)
        renamed[nk] = v
    tree = convert_state_dict(renamed)
    # undo the to_out_linear placeholder (torch `to_out.0` inside ModuleList
    # already collapses via the generic rule; this handles denoise_encoder's)
    return tree


def split_faithdiff_bin(
    state_dict: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Dict[str, Any]]]:
    """Split the flat FaithDiff.bin layout into (core_unet_sd, extras_sd),
    mirroring `unet_2d_condition_vae_extension.py:444-478`."""
    extra_namespaces = (
        "denoise_encoder.", "information_transformer_layes.",
        "condition_embedding.", "agg_net.", "spatial_ch_projs.",
    )
    core: Dict[str, Any] = {}
    extras: Dict[str, Dict[str, Any]] = {ns[:-1]: {} for ns in extra_namespaces}
    for key, value in state_dict.items():
        for ns in extra_namespaces:
            if key.startswith(ns):
                extras[ns[:-1]][key[len(ns):]] = value
                break
        else:
            core[key] = value
    return core, extras


def convert_faithdiff_unet(
    core_sd: Mapping[str, Any], extras_sd: Mapping[str, Mapping[str, Any]]
) -> Dict[str, Any]:
    """Build full UNet params (core + fusion modules) from a split
    FaithDiff.bin. The denoise_encoder is converted separately via
    `convert_denoise_encoder` (it lives outside the UNet in our pipeline,
    like the reference wires it into the pipeline object)."""
    merged = dict(core_sd)
    for mod in ("information_transformer_layes", "condition_embedding",
                "spatial_ch_projs"):
        for k, v in extras_sd.get(mod, {}).items():
            merged[f"{mod}.{k}"] = v
    return convert_unet(merged)


def convert_denoise_encoder(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """denoise_encoder.* keys (headless VAE encoder) -> DenoiseEncoder params
    (nested under "encoder" to match our module layout)."""
    tree = convert_state_dict(sd)
    return {"encoder": tree}


def convert_vae(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """diffusers AutoencoderKL -> our `AutoencoderKL` params."""
    return convert_state_dict(state_dict)


def convert_clip_text(
    state_dict: Mapping[str, Any], with_projection: bool = False
) -> Dict[str, Any]:
    """transformers CLIPTextModel[WithProjection] -> `CLIPTextTower` params."""
    rename = {
        r"^text_model\.embeddings\.token_embedding\.": "token_embedding.",
        r"^text_model\.embeddings\.position_embedding\.": "position_embedding_raw.",
        r"^text_model\.encoder\.": "",
        r"^text_model\.final_layer_norm\.": "final_layer_norm.",
        r"^text_projection\.": "text_projection.",
    }
    tree: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        if key == "text_model.embeddings.position_ids":
            continue
        nk = key
        for pat, repl in rename.items():
            nk = re.sub(pat, repl, nk)
        arr = _to_numpy(tensor)
        if nk == "position_embedding_raw.weight":
            tree["position_embedding"] = arr
            continue
        if nk == "token_embedding.weight":
            _set(tree, ("token_embedding", "embedding"), arr)
            continue
        parts = _rename_parts(nk.split("."))
        path, value = _convert_entry(parts, arr)
        _set(tree, tuple(path), value)
    return tree


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pth torch checkpoint to numpy (host-side, no GPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _to_numpy(v) for k, v in sd.items()}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    try:
        from safetensors.numpy import load_file

        return load_file(path)
    except ImportError:
        from safetensors.torch import load_file as tl

        return {k: _to_numpy(v) for k, v in tl(path).items()}


# ---------------------------------------------------------------------------
# inverse: flax params -> torch/diffusers state-dict keys (export path,
# also used to validate conversion completeness without real checkpoints)
# ---------------------------------------------------------------------------

_INDEXED_SET = set(_INDEXED)


def _flax_path_to_torch_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Map a flax param path to (torch_key, transform) where transform in
    {conv, linear, norm, raw} describes the tensor layout conversion."""
    parts = []
    for p in path[:-1]:
        # down_blocks_0 -> down_blocks.0
        for base in _INDEXED_SET:
            if p.startswith(base + "_") and p[len(base) + 1:].isdigit():
                parts.extend([base, p[len(base) + 1:]])
                break
        else:
            parts.append(p)
    leaf = path[-1]
    # reverse the special renames of convert_unet
    key = ".".join(parts)
    key = key.replace("information_transformer.layers.",
                      "information_transformer_layes.")
    key = key.replace("information_transformer.spatial_ch_projs",
                      "spatial_ch_projs")
    key = re.sub(r"(information_transformer_layes\.\d+)\.ln_",
                 r"\1.ln_", key)
    key = re.sub(r"(information_transformer_layes\.\d+)\.in_proj$",
                 r"\1.attn", key)
    key = re.sub(r"(information_transformer_layes\.\d+)\.out_proj$",
                 r"\1.attn.out_proj", key)
    key = re.sub(r"(information_transformer_layes\.\d+)\.mlp_c_fc",
                 r"\1.mlp.c_fc", key)
    key = re.sub(r"(information_transformer_layes\.\d+)\.mlp_c_proj",
                 r"\1.mlp.c_proj", key)
    if key.endswith("to_out"):
        key = key + ".0"

    if leaf == "kernel":
        if key.endswith(".attn"):  # packed qkv
            return key + ".in_proj_weight", "linear"
        return key + ".weight", "auto"
    if leaf == "scale":
        return key + ".weight", "norm"
    if leaf == "bias":
        if key.endswith(".attn"):
            return key + ".in_proj_bias", "raw"
        return key + ".bias", "raw"
    raise KeyError(f"unhandled flax leaf {path}")


def export_to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Flatten a flax param tree to diffusers/torch naming + layouts
    (inverse of `convert_unet`/`convert_vae`). Enables exporting trained
    params back to the reference's FaithDiff.bin format."""
    import jax

    out: Dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        torch_key, transform = _flax_path_to_torch_key(keys)
        arr = np.asarray(leaf)
        if transform == "auto":
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            elif arr.ndim == 2:
                arr = arr.T
        elif transform == "linear":
            arr = arr.T
        out[torch_key] = arr
    return out


# ---------------------------------------------------------------------------
# LLaVA captioner conversions
# ---------------------------------------------------------------------------


def _fix_rmsnorm_names(tree):
    """RMSNorm weights land as {'scale': ...} from the generic rule but our
    RMSNorm param is named 'weight'."""
    if isinstance(tree, dict):
        if set(tree) == {"scale"}:
            return {"weight": tree["scale"]}
        return {k: _fix_rmsnorm_names(v) for k, v in tree.items()}
    return tree


def convert_llama(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """transformers LlamaForCausalLM -> our `LlamaForCausalLM` params.

    Handles the LLaVA variant (`llava/model/language_model/llava_llama.py`)
    by dropping the multimodal tower keys (converted separately)."""
    sd = {}
    emb = None
    for k, v in state_dict.items():
        if "vision_tower" in k or "mm_projector" in k:
            continue
        if k == "model.embed_tokens.weight":
            emb = _to_numpy(v)
            continue
        k = k.replace(".mlp.", ".")
        sd[k] = v
    tree = _fix_rmsnorm_names(convert_state_dict(sd))
    if emb is not None:
        tree["embed_tokens"] = {"embedding": emb}
    return tree


# transformers Mistral uses the exact LLaMA key naming (the reference's
# Mistral binding, `llava/model/language_model/llava_mistral.py`)
convert_mistral = convert_llama


def convert_mpt(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """transformers MPTForCausalLM -> our `MPTForCausalLM` params
    (the reference's MPT binding, `llava/model/language_model/llava_mpt.py`).

    MPT keys: transformer.wte.weight, transformer.blocks.N.{norm_1.weight,
    attn.Wqkv.weight, attn.out_proj.weight, norm_2.weight,
    ffn.up_proj.weight, ffn.down_proj.weight}, transformer.norm_f.weight."""
    tree: Dict[str, Any] = {}
    for k, v in state_dict.items():
        if "vision_tower" in k or "mm_projector" in k:
            continue
        arr = _to_numpy(v)
        parts = k.split(".")
        if parts[0] == "transformer":
            parts = parts[1:]
        if parts[0] == "wte":
            tree["wte"] = {"embedding": arr}
            continue
        if parts[0] == "norm_f":
            tree["norm_f"] = {"weight": arr}
            continue
        assert parts[0] == "blocks", k
        blk = tree.setdefault(f"blocks_{parts[1]}", {})
        rest = parts[2:]
        if rest[0] in ("norm_1", "norm_2"):
            blk[rest[0]] = {"weight": arr}
        elif rest[0] == "attn":
            blk.setdefault("attn", {})[rest[1]] = {"kernel": arr.T}
        elif rest[0] == "ffn":
            blk[rest[1]] = {"kernel": arr.T}
        else:
            raise KeyError(f"unhandled MPT key {k}")
    return tree


def convert_clip_vision(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """transformers CLIPVisionModel -> our `CLIPVisionTower` params."""
    sd = {}
    cls_emb = None
    pos_emb = None
    for k, v in state_dict.items():
        k = k.replace("vision_model.", "")
        if k == "embeddings.position_ids":
            continue
        if k == "embeddings.class_embedding":
            cls_emb = _to_numpy(v)
            continue
        if k == "embeddings.position_embedding.weight":
            pos_emb = _to_numpy(v)
            continue
        if k.startswith("post_layernorm"):
            continue  # LLaVA selects pre-final hidden states; unused
        k = k.replace("embeddings.patch_embedding.", "patch_embedding.")
        k = k.replace("encoder.", "")
        k = k.replace(".self_attn.", ".")
        k = k.replace(".mlp.", ".")
        sd[k] = v
    tree = convert_state_dict(sd)
    if cls_emb is not None:
        tree["class_embedding"] = cls_emb
    if pos_emb is not None:
        tree["position_embedding"] = pos_emb
    return tree


def convert_vision_projector(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """LLaVA mm_projector (mlp2x_gelu: Sequential 0/2 Linears) -> our
    `VisionProjector` (linear_0 / linear_2)."""
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("mm_projector.", "")
        k = re.sub(r"^(\d)\.", r"linear_\1.", k)
        sd[k] = v
    return convert_state_dict(sd)
