"""Caption agent: the LLaVA-v1.5 pipeline glueing vision tower + projector +
LLaMA decode into `caption(image) -> str`.

Capability-equivalent to `LLavaAgent`
(`/root/reference/llava/llm_agent.py:18-103`): vicuna_v1 conversation with
an `<image>` slot, the fixed question "Describe this image and its style in
a very detailed manner.", sampling at temperature 0.2 / top-p 0.7, max 512
new tokens.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .clip_vision import (CLIPVisionConfig, CLIPVisionTower, VisionProjector,
                          preprocess_clip_image)
from .llama import LlamaConfig, LlamaForCausalLM, greedy_generate

DEFAULT_QUESTION = "Describe this image and its style in a very detailed manner."

def build_vicuna_prompt(question: str,
                        template: str = "vicuna_v1") -> List[str]:
    """Return the text segments around the image slot:
    [pre_image_text, post_image_text] — the conversation-template render
    split on the `<image>` placeholder (`llava/mm_utils.py:185` semantics)."""
    from .conversation import build_prompt

    pre, post = build_prompt(template, question).split("<image>", 1)
    return [pre, post]


@dataclasses.dataclass
class CaptionAgent:
    """Glues tokenizer + vision tower + projector + LM."""

    llama: LlamaForCausalLM
    llama_params: Any
    vision: CLIPVisionTower
    vision_params: Any
    projector: VisionProjector
    projector_params: Any
    tokenizer: Any                      # sentencepiece-style (HF LlamaTokenizer)
    temperature: float = 0.2
    top_p: float = 0.7
    max_new_tokens: int = 512

    @staticmethod
    def from_checkpoint(ckpt_dir: str, dtype=jnp.bfloat16,
                        load_8bit: bool = True,
                        load_4bit: bool = False,
                        model_type: str = "") -> "CaptionAgent":
        """Load converted params + tokenizer from a local directory
        (layout: llama/ vision/ projector/ tokenizer/; an optional lora/
        subdirectory is merged into the LM weights before quantization,
        mirroring the reference builder's LoRA-merge path,
        `llava/model/builder.py:48-90`).

        `model_type` in {"llama", "mistral", "mpt"}; empty infers from the
        directory name the way the reference builder keys on the model name
        (`llava/model/builder.py:26`). Mistral is the LLaMA architecture +
        GQA + sliding window; MPT (`captioner/mpt.py`) uses ALiBi and a
        tied lm_head. Weight-only quantization currently applies to the
        llama/mistral family.

        load_8bit quantises the LM projections to int8 weight-only;
        load_4bit to blockwise nf4 (takes precedence, mirroring the
        reference builder's `load_4bit` branch,
        `llava/model/builder.py:29-38`). One of them is required in
        practice: LLaVA-13B bf16 weights (26 GB) exceed one v5e chip's HBM
        (int8 13 GB, nf4 6.6 GB)."""
        import dataclasses as _dc

        from transformers import AutoTokenizer

        from ..training.checkpoint import load_params
        from .llama import quantize_llama_params

        if not model_type:
            name = os.path.basename(os.path.normpath(ckpt_dir)).lower()
            model_type = ("mpt" if "mpt" in name
                          else "mistral" if "mistral" in name else "llama")
        quant = "nf4" if load_4bit else ("int8" if load_8bit else "")
        if model_type == "mpt":
            from .mpt import MPTConfig, MPTForCausalLM

            llama = MPTForCausalLM(MPTConfig(), dtype=dtype)
            hidden = llama.config.d_model
            quant = ""
        else:
            base = (LlamaConfig.mistral_7b() if model_type == "mistral"
                    else LlamaConfig.llava_13b())
            llama_cfg = _dc.replace(base, quant=quant)
            llama = LlamaForCausalLM(llama_cfg, dtype=dtype)
            hidden = llama_cfg.hidden_size
        vision = CLIPVisionTower(CLIPVisionConfig(), dtype=dtype)
        projector = VisionProjector(hidden, dtype=dtype)
        llama_tree = load_params(os.path.join(ckpt_dir, "llama"))
        lora_dir = os.path.join(ckpt_dir, "lora")
        if os.path.exists(lora_dir):
            from ..training.lora import merge_lora

            llama_tree = merge_lora(llama_tree,
                                    load_params(lora_dir))
        if quant:
            llama_tree = quantize_llama_params(llama_tree, mode=quant)
        return CaptionAgent(
            llama=llama,
            llama_params={"params": llama_tree},
            vision=vision,
            vision_params={"params": load_params(os.path.join(ckpt_dir, "vision"))},
            projector=projector,
            projector_params={"params": load_params(
                os.path.join(ckpt_dir, "projector"))},
            tokenizer=AutoTokenizer.from_pretrained(
                os.path.join(ckpt_dir, "tokenizer")),
        )

    def _embed_ids(self, ids: np.ndarray) -> jax.Array:
        return self.llama.apply(
            self.llama_params, jnp.asarray(ids),
            method="embed")

    def build_multimodal_embeds(
        self, images, question: str = DEFAULT_QUESTION,
        image_aspect_ratio: str = "pad",
        anyres_grid_pinpoints=None,
    ) -> jax.Array:
        """Tokenise around the image slot and splice projected image patches
        (`llava/model/llava_arch.py:145-324` splice semantics).

        `images`: one HWC array or a list of them — all samples share the
        prompt and the fixed 576-patch image slot, so the batch stacks
        without padding (the reference's batched `gen_image_caption`,
        `llava/llm_agent.py:66-103`).

        `image_aspect_ratio`: "pad" (expand2square, the LLaVA-1.5 default),
        "square" (plain resize), or "anyres" with `anyres_grid_pinpoints` —
        base image + grid patches encoded separately and their features
        concatenated (the reference's `mm_patch_merge_type == "flat"` path,
        `llava_arch.py:160-166`). Batched anyres splices per-sample patch
        counts and LEFT-pads to the batch max (the reference right-pads
        with an attention mask, `llava_arch.py:289-310`; left-padding keeps
        every sample's last token at a static index for decode).

        Returns `(embeds [B, L, D], pad_len)` where `pad_len` is a [B]
        int32 array of left-pad counts, or None when all samples share one
        length (the fast fully-dense path)."""
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        pre, post = build_vicuna_prompt(question)
        pre_ids = np.asarray(
            self.tokenizer(pre, return_tensors="np").input_ids, np.int32)
        post_ids = np.asarray(
            self.tokenizer(post, add_special_tokens=False,
                           return_tensors="np").input_ids, np.int32)

        size = self.vision.config.image_size
        n = len(images)
        if image_aspect_ratio == "anyres":
            from .clip_vision import process_anyres_image

            assert anyres_grid_pinpoints is not None
            stacks = [process_anyres_image(im, size, anyres_grid_pinpoints)
                      for im in images]
            counts = [st.shape[0] for st in stacks]
            # one vision/projector batch over every sample's patches
            feats = self.vision.apply(self.vision_params,
                                      jnp.asarray(np.concatenate(stacks)))
            emb = self.projector.apply(self.projector_params, feats)
            # per-sample flat merge: [k_i, P, D] -> [1, k_i*P, D]
            per_sample, off = [], 0
            for c in counts:
                per_sample.append(
                    emb[off:off + c].reshape(1, -1, emb.shape[-1]))
                off += c
        else:
            pixel = np.concatenate([
                preprocess_clip_image(im, size,
                                      pad_square=image_aspect_ratio == "pad")
                for im in images])
            feats = self.vision.apply(self.vision_params, jnp.asarray(pixel))
            img_embeds = self.projector.apply(self.projector_params, feats)
            per_sample = [img_embeds[i:i + 1] for i in range(n)]

        pre_e = self._embed_ids(pre_ids)
        post_e = self._embed_ids(post_ids)
        seqs = [jnp.concatenate(
            [pre_e, e.astype(pre_e.dtype), post_e], axis=1)
            for e in per_sample]
        lens = [int(sq.shape[1]) for sq in seqs]
        max_len = max(lens)
        if all(ln == max_len for ln in lens):
            return jnp.concatenate(seqs, axis=0), None
        padded = [jnp.pad(sq, ((0, 0), (max_len - ln, 0), (0, 0)))
                  for sq, ln in zip(seqs, lens)]
        pad_len = jnp.asarray([max_len - ln for ln in lens], jnp.int32)
        return jnp.concatenate(padded, axis=0), pad_len

    def _stop_sequences(self):
        """Keyword stopping on the conversation separator (the reference's
        KeywordsStoppingCriteria over `conv.sep2` == '</s>',
        `llava/mm_utils.py:216-247`) in addition to the eos id."""
        seqs = []
        for kw in ("</s>",):
            ids = np.asarray(
                self.tokenizer(kw, add_special_tokens=False).input_ids
            ).ravel()
            if ids.size:
                seqs.append(tuple(int(t) for t in ids))
        return tuple(seqs)

    def caption_batch(self, images, question: str = DEFAULT_QUESTION,
                      seed: int = 0, image_aspect_ratio: str = "pad",
                      anyres_grid_pinpoints=None) -> List[str]:
        """Caption several images in one batched generate (per-sample
        lengths; finished samples pad with eos). Batched anyres runs as one
        left-padded static batch (see `build_multimodal_embeds`)."""
        embeds, pad_len = self.build_multimodal_embeds(
            images, question, image_aspect_ratio=image_aspect_ratio,
            anyres_grid_pinpoints=anyres_grid_pinpoints)
        result = greedy_generate(
            self.llama, self.llama_params, embeds,
            max_new_tokens=self.max_new_tokens,
            eos_token_id=int(self.tokenizer.eos_token_id or 2),
            temperature=self.temperature, top_p=self.top_p,
            key=jax.random.PRNGKey(seed),
            stop_sequences=self._stop_sequences(),
            pad_len=pad_len,
        )
        out = []
        for bi in range(result.tokens.shape[0]):
            ids = np.asarray(result.tokens[bi][: int(result.lengths[bi])])
            out.append(self.tokenizer.decode(
                ids, skip_special_tokens=True).strip())
        return out

    def caption(self, image: np.ndarray,
                question: str = DEFAULT_QUESTION, seed: int = 0) -> str:
        return self.caption_batch([image], question, seed)[0]
