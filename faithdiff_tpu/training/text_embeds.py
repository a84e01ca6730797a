"""Prompt-embedding supply for training.

Fixes the round-1 defect where caption dropout happened on the *string*
(`data/dataset.py`) but precomputed embeds were keyed by dataset index, so
the reference's null-prompt regularization
(`/root/reference/dataloader/Realesrgan_offline_dataset.py:227-261`,
`/root/reference/train_SDXL_stage_1.py:889-895`) never reached the UNet.

Embeds are keyed by sample STEM (filename without extension), with a
dedicated null-prompt embedding (`__null__`) substituted whenever the
dataset dropped the caption — or the towers are run live per unique caption
(the reference's per-step dual text encode, cached because captions repeat
across epochs).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

NULL_KEY = "__null__"

_GetFn = Callable[[str, str], Tuple[np.ndarray, np.ndarray]]


class PromptEmbedProvider:
    """Supplies per-sample (prompt_embeds, pooled_embeds) for batches.

    Tracks how many lookups consumed the null embedding so the dropout rate
    is observable (`null_consumed / total`).
    """

    def __init__(self, get_fn: _GetFn):
        self._get = get_fn
        self.null_consumed = 0
        self.total = 0

    def batch(
        self, stems: Sequence[str], captions: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        pes, pooleds = [], []
        for stem, cap in zip(stems, captions):
            pe, pooled = self._get(stem, cap)
            self.total += 1
            if cap == "":
                self.null_consumed += 1
            pes.append(pe)
            pooleds.append(pooled)
        return np.stack(pes), np.stack(pooleds)

    @property
    def null_fraction(self) -> float:
        return self.null_consumed / max(self.total, 1)

    # ------------------------------------------------------------------
    @classmethod
    def from_dir(cls, embeds_dir: str) -> "PromptEmbedProvider":
        """Stem-keyed `<stem>.npz` files (prompt_embeds/pooled_embeds) plus
        the mandatory `__null__.npz` produced by `cli embed` for dropped
        captions."""
        null_path = os.path.join(embeds_dir, f"{NULL_KEY}.npz")
        if not os.path.exists(null_path):
            raise FileNotFoundError(
                f"{null_path} missing: precompute embeds with "
                "`python -m faithdiff_tpu.cli embed` (it always emits the "
                "null-prompt embedding used for caption dropout)")
        cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

        def load(key: str) -> Tuple[np.ndarray, np.ndarray]:
            if key not in cache:
                z = np.load(os.path.join(embeds_dir, f"{key}.npz"))
                cache[key] = (z["prompt_embeds"].astype(np.float32),
                              z["pooled_embeds"].astype(np.float32))
            return cache[key]

        def get(stem: str, caption: str):
            return load(NULL_KEY if caption == "" else stem)

        return cls(get)

    # ------------------------------------------------------------------
    @classmethod
    def from_towers(
        cls, tokenize, encode, max_cache: int = 8192,
    ) -> "PromptEmbedProvider":
        """Live dual-tower encoding per unique caption string.

        `tokenize(caption) -> (ids_1, ids_2)` each [1, 77];
        `encode(ids_1, ids_2) -> (prompt_embeds [1,77,D], pooled [1,P])`.
        Cached by caption text — the dropped-caption "" encodes once and
        becomes the null embedding, exactly the reference's null-prompt ids
        path (`Realesrgan_offline_dataset.py:231-261`).
        """
        cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

        def get(stem: str, caption: str):
            if caption not in cache:
                if len(cache) >= max_cache:
                    cache.pop(next(iter(cache)))
                ids_1, ids_2 = tokenize(caption)
                pe, pooled = encode(ids_1, ids_2)
                cache[caption] = (np.asarray(pe[0], np.float32),
                                  np.asarray(pooled[0], np.float32))
            return cache[caption]

        return cls(get)

    # ------------------------------------------------------------------
    @classmethod
    def zeros(cls, cross_dim: int, pooled_dim: int) -> "PromptEmbedProvider":
        """Unconditional training (no text checkpoint available)."""
        pe = np.zeros((77, cross_dim), np.float32)
        pooled = np.zeros((pooled_dim,), np.float32)

        def get(stem: str, caption: str):
            return pe, pooled

        return cls(get)


def precompute_embeds(
    caption_files: Sequence[str],
    save_dir: str,
    tokenize,
    encode,
    trim: bool = True,
) -> int:
    """`cli embed` core: encode each caption file (txt, or json with a
    "caption" field) to `<stem>.npz`, plus the `__null__.npz` empty-prompt
    embedding. Returns the number of files written."""
    import json

    from ..data.dataset import trim_caption

    os.makedirs(save_dir, exist_ok=True)
    written = 0
    for path in list(caption_files) + [None]:
        if path is None:
            stem, caption = NULL_KEY, ""
        else:
            stem = os.path.splitext(os.path.basename(path))[0]
            with open(path) as f:
                text = f.read().strip()
            if path.endswith(".json"):
                text = json.loads(text).get("caption", "")
            caption = trim_caption(text) if trim else text
        out_path = os.path.join(save_dir, f"{stem}.npz")
        if os.path.exists(out_path) and stem != NULL_KEY:
            continue
        ids_1, ids_2 = tokenize(caption)
        pe, pooled = encode(ids_1, ids_2)
        np.savez(out_path,
                 prompt_embeds=np.asarray(pe[0], np.float32),
                 pooled_embeds=np.asarray(pooled[0], np.float32))
        written += 1
    return written
