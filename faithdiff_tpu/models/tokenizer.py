"""CLIP tokenizer wrapper + prompt encoding.

The reference tokenises with two `CLIPTokenizer`s from the SDXL repo
(`pipeline_FaithDiff_tlc.py:587-596`). Tokenisation is pure host-side string
processing; we wrap transformers' CLIPTokenizer(Fast) loaded from a local
path (no network in this environment). When tokenizer files are not
available, callers pass precomputed embeddings instead — the pipeline
accepts embeds directly, like the reference's `prompt_embeds` arguments.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_BOS, _EOS, _MAX_LEN = 49406, 49407, 77


class SDXLTokenizer:
    """Dual tokenizer for the two SDXL text towers.

    `path_1` / `path_2`: local dirs holding vocab.json + merges.txt for each
    tower (they share the CLIP BPE; SDXL ships tokenizer/ tokenizer_2/).
    """

    def __init__(self, path_1: str, path_2: Optional[str] = None):
        from transformers import CLIPTokenizer

        self.tok_1 = CLIPTokenizer.from_pretrained(path_1)
        self.tok_2 = CLIPTokenizer.from_pretrained(path_2 or path_1)

    def __call__(self, prompts) -> Tuple[np.ndarray, np.ndarray]:
        """prompts: str or list[str] -> (ids_1, ids_2) each [B, 77] int32,
        padded to max length with truncation (the reference's settings,
        `pipeline_FaithDiff_tlc.py:587-593`)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        out = []
        for tok in (self.tok_1, self.tok_2):
            enc = tok(prompts, padding="max_length", max_length=_MAX_LEN,
                      truncation=True, return_tensors="np")
            out.append(enc.input_ids.astype(np.int32))
        return out[0], out[1]


class HashTokenizer:
    """Deterministic word-hash tokenizer for checkpoint-free smoke runs and
    tests (NOT CLIP BPE — real runs load `SDXLTokenizer` from local vocab
    files). Empty prompt -> [BOS, EOS, EOS, ...], mirroring CLIP padding,
    so the null-prompt path is exercised end-to-end without downloads."""

    def __init__(self, vocab_size: int = 49408, max_len: int = _MAX_LEN):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def _encode_one(self, prompt: str) -> np.ndarray:
        import zlib

        bos = min(_BOS, self.vocab_size - 2)
        eos = min(_EOS, self.vocab_size - 1)
        ids = [bos]
        for w in prompt.split()[: self.max_len - 2]:
            ids.append(zlib.crc32(w.encode()) % max(self.vocab_size - 3, 1) + 1)
        ids.append(eos)
        ids += [eos] * (self.max_len - len(ids))
        return np.asarray(ids, np.int32)

    def __call__(self, prompts) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        ids = np.stack([self._encode_one(p) for p in prompts])
        return ids, ids


def pad_token_ids(prompt_ids: np.ndarray) -> np.ndarray:
    """[B, <=77] -> [B, 77] padded with EOS (CLIP pad == eos)."""
    b, s = prompt_ids.shape
    if s >= _MAX_LEN:
        return prompt_ids[:, :_MAX_LEN]
    pad = np.full((b, _MAX_LEN - s), _EOS, prompt_ids.dtype)
    return np.concatenate([prompt_ids, pad], axis=1)


def encode_prompt(
    text_encoder_apply,
    text_params,
    ids_1: np.ndarray,
    ids_2: np.ndarray,
):
    """Run the dual towers -> (prompt_embeds [B, 77, 2048],
    pooled [B, 1280]); negative branch is zeros via
    force_zeros_for_empty_prompt and lives in the pipeline."""
    return text_encoder_apply(text_params, ids_1, ids_2)
