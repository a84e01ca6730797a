"""Caption dropout must reach the UNet as null-prompt embeddings
(reference: `Realesrgan_offline_dataset.py:227-261` tokenizes dropped
captions to null ids; `train_SDXL_stage_1.py:889-895` encodes per step).

Round-1 defect: precomputed embeds were keyed by dataset index, so the
string-level dropout never changed what the model saw. These tests drive
the fixed flow end-to-end: cli embed -> stem-keyed dir -> dataset batches
-> ~20% null-embed consumption.
"""
import os
import types

import numpy as np
import pytest
from PIL import Image

from faithdiff_tpu.models.tokenizer import HashTokenizer
from faithdiff_tpu.training.text_embeds import (NULL_KEY, PromptEmbedProvider,
                                                precompute_embeds)


def _tiny_encode():
    """Deterministic fake dual-tower encode: embeds derived from ids."""
    def encode(ids_1, ids_2):
        pe = ids_1[..., None].astype(np.float32) * \
            np.ones((1, 1, 8), np.float32)
        pooled = np.asarray(ids_2, np.float32)[:, :4]
        return pe, pooled
    return encode


def test_hash_tokenizer_shapes_and_null():
    tok = HashTokenizer(vocab_size=128)
    ids_1, ids_2 = tok(["a photo of a cat", ""])
    assert ids_1.shape == (2, 77) and ids_2.shape == (2, 77)
    # empty prompt: BOS then all EOS
    assert ids_1[1, 0] == 126 and (ids_1[1, 1:] == 127).all()
    # deterministic
    again, _ = tok("a photo of a cat")
    np.testing.assert_array_equal(ids_1[0], again[0])


def test_provider_from_towers_caches_and_counts_null():
    tok = HashTokenizer(vocab_size=128)
    provider = PromptEmbedProvider.from_towers(
        lambda c: tok(c), _tiny_encode())
    captions = ["a cat", "", "a dog", "", "a cat"]
    pe, pooled = provider.batch([f"s{i}" for i in range(5)], captions)
    assert pe.shape[0] == 5 and pooled.shape[0] == 5
    assert provider.null_consumed == 2 and provider.total == 5
    # dropped captions share the null embedding; distinct captions differ
    np.testing.assert_array_equal(pe[1], pe[3])
    np.testing.assert_array_equal(pe[0], pe[4])
    assert not np.array_equal(pe[0], pe[2])


def test_precompute_and_from_dir(tmp_path):
    cap_dir = tmp_path / "caps"
    cap_dir.mkdir()
    (cap_dir / "img1.txt").write_text("one two three a bright red fox. extra.")
    (cap_dir / "img2.txt").write_text("one two three a blue bird. more. even")
    tok = HashTokenizer(vocab_size=128)
    n = precompute_embeds(
        [str(cap_dir / "img1.txt"), str(cap_dir / "img2.txt")],
        str(tmp_path / "emb"), lambda c: tok(c), _tiny_encode())
    assert n == 3  # two stems + __null__
    assert os.path.exists(tmp_path / "emb" / f"{NULL_KEY}.npz")

    provider = PromptEmbedProvider.from_dir(str(tmp_path / "emb"))
    pe, _ = provider.batch(["img1", "img1", "img2"],
                           ["a bright red fox", "", "a blue bird"])
    # row 1 was dropped -> equals the null embedding, not img1's
    null = np.load(tmp_path / "emb" / f"{NULL_KEY}.npz")["prompt_embeds"]
    np.testing.assert_array_equal(pe[1], null)
    assert not np.array_equal(pe[0], pe[1])
    assert provider.null_fraction == pytest.approx(1 / 3)


def test_from_dir_requires_null_embedding(tmp_path):
    (tmp_path / "x.npz").touch()
    with pytest.raises(FileNotFoundError, match="null"):
        PromptEmbedProvider.from_dir(str(tmp_path))


def test_cli_embed_tiny(tmp_path):
    from faithdiff_tpu.cli import cmd_embed

    cap_dir = tmp_path / "caps"
    cap_dir.mkdir()
    (cap_dir / "a.txt").write_text("w1 w2 w3 a sunny beach with palm trees.")
    (cap_dir / "b.json").write_text('{"caption": "w1 w2 w3 a snowy hill."}')
    cmd_embed(["--caption_dir", str(cap_dir),
               "--save_dir", str(tmp_path / "emb"), "--tiny"])
    files = sorted(os.listdir(tmp_path / "emb"))
    assert files == [f"{NULL_KEY}.npz", "a.npz", "b.npz"]
    z = np.load(tmp_path / "emb" / "a.npz")
    assert z["prompt_embeds"].shape == (77, 64)   # 2 x 32 hidden concat
    assert z["pooled_embeds"].shape == (64,)


def test_dataset_batches_consume_null_embeds(tmp_path):
    """The full training-data path: ~20% of consumed embeds are the null
    embedding (the reference's t_drop_rate regularization, now alive)."""
    from faithdiff_tpu.training.runner import _dataset_batches

    hr_dir, lr_dir, cap_dir = (tmp_path / d for d in ("hr", "lr", "caps"))
    for d in (hr_dir, lr_dir, cap_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        hr = rng.integers(0, 255, (64, 64, 3), np.uint8)
        lr = rng.integers(0, 255, (16, 16, 3), np.uint8)
        Image.fromarray(hr).save(hr_dir / f"s{i}.png")
        Image.fromarray(lr).save(lr_dir / f"s{i}.png")
        (cap_dir / f"s{i}.txt").write_text(f"w1 w2 w3 scene number {i}.")

    tok = HashTokenizer(vocab_size=128)
    caption_files = sorted(str(p) for p in cap_dir.iterdir())
    precompute_embeds(caption_files, str(tmp_path / "emb"),
                      lambda c: tok(c), _tiny_encode())
    provider = PromptEmbedProvider.from_dir(str(tmp_path / "emb"))

    args = types.SimpleNamespace(
        hr_dir=str(hr_dir), lr_dir=str(lr_dir), caption_dir=str(cap_dir),
        embeds_dir=str(tmp_path / "emb"), text_encoder_dir=None,
        tokenizer_dir=None, resolution=32, train_batch_size=8, seed=3)
    batches = _dataset_batches(args, cross_dim=8, pooled_dim=4,
                               provider=provider)
    null = np.load(tmp_path / "emb" / f"{NULL_KEY}.npz")["prompt_embeds"]
    null_rows = 0
    for _ in range(40):
        batch = next(batches)
        assert batch["prompt_embeds"].shape == (8, 77, 8)
        null_rows += sum(
            np.array_equal(batch["prompt_embeds"][j], null)
            for j in range(8))
    # 320 samples at t_drop_rate=0.2 -> binomial(320, .2): [40, 90] is >6 sigma
    assert 40 <= null_rows <= 90, null_rows
    assert provider.null_fraction == pytest.approx(null_rows / 320)
