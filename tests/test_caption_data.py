"""Captioner training data utils: grouped samplers, image-token splice,
conversation preprocessing with assistant-only supervision."""
import re

import numpy as np

from faithdiff_tpu.training.caption_data import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX, LengthGroupedSampler,
    get_length_grouped_indices, get_modality_length_grouped_indices,
    preprocess_conversation, split_to_even_chunks, tokenizer_image_token)


def test_split_to_even_chunks_balances_totals():
    lengths = [10, 9, 8, 1, 1, 1]
    chunks = split_to_even_chunks(list(range(6)), lengths, 2)
    assert sorted(i for c in chunks for i in c) == list(range(6))
    totals = [sum(lengths[i] for i in c) for c in chunks]
    assert max(totals) - min(totals) <= 9


def test_length_grouped_indices_is_permutation_and_sorted_per_megabatch():
    rng = np.random.default_rng(0)
    lengths = rng.integers(1, 100, 32).tolist()
    out = get_length_grouped_indices(lengths, batch_size=4, world_size=2,
                                     rng=np.random.default_rng(1))
    assert sorted(out) == list(range(32))


def test_modality_grouped_never_mixes_within_megabatch():
    # positive = multimodal, negative = language-only
    lengths = [5, 7, -3, 9, -8, 6, -2, 4, 11, -6, 10, -9, 3, 8, -4, -7]
    bs, ws = 2, 2
    out = get_modality_length_grouped_indices(
        lengths, bs, ws, np.random.default_rng(0))
    assert sorted(out) == list(range(16))
    mb = bs * ws
    mixed = 0
    for i in range(0, len(out) - mb + 1, mb):
        signs = {lengths[j] > 0 for j in out[i:i + mb]}
        mixed += len(signs) > 1
    # only the final catch-all megabatch may mix (`llava_trainer.py:75-83`)
    assert mixed <= 1


def test_sampler_iterates_all():
    s = LengthGroupedSampler(2, 2, [3, 1, 4, 1, 5, 9, 2, 6],
                             rng=np.random.default_rng(0),
                             group_by_modality=False)
    assert sorted(iter(s)) == list(range(8))
    assert len(s) == 8


class SPStubTokenizer:
    """Sentencepiece-like word tokenizer: bos prepended, '</s>' one token."""

    bos_token_id = 1
    legacy = True

    def __init__(self):
        self.vocab = {"</s>": 2}

    def _word_id(self, w):
        return self.vocab.setdefault(w, len(self.vocab) + 10)

    def __call__(self, text):
        # sentencepiece treats </s> as its own token even without spaces
        words = text.replace("</s>", " </s> ").split()

        class Enc:
            input_ids = [self.bos_token_id] + [self._word_id(w)
                                               for w in words]

        return Enc()


def test_tokenizer_image_token_inserts_sentinel():
    tok = SPStubTokenizer()
    ids = tokenizer_image_token("hello <image> world", tok)
    assert ids[0] == tok.bos_token_id
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    # no extra bos leaked from the second chunk
    assert ids.count(tok.bos_token_id) == 1


def test_preprocess_conversation_masks_user_supervises_assistant():
    tok = SPStubTokenizer()
    turns = [("what is in the picture", "a red fox in snow"),
             ("how many foxes", "exactly one fox")]
    input_ids, labels = preprocess_conversation(turns, tok,
                                                template="vicuna_v1")
    assert input_ids.shape == labels.shape
    id2w = {v: k for k, v in tok.vocab.items()}
    sup_words = [id2w.get(int(t), f"w{t}")
                 for t, l in zip(input_ids, labels) if l != IGNORE_INDEX]
    # every supervised token belongs to an assistant answer (+ separators;
    # the reference's `-2` keeps the ASSISTANT: boundary token supervised,
    # `train.py:472-476`)
    answers = set("a red fox in snow exactly one fox </s> ASSISTANT:".split())
    assert sup_words, "nothing supervised"
    assert set(sup_words) <= answers
    # and the bulk of both answers is supervised
    assert "fox" in sup_words and "snow" in sup_words
    # user/system words are fully masked
    masked_words = [id2w.get(int(t), "?")
                    for t, l in zip(input_ids, labels) if l == IGNORE_INDEX]
    assert "picture" in masked_words and "USER:" in masked_words


def test_preprocess_conversation_with_image_token():
    tok = SPStubTokenizer()
    turns = [("<image>\ndescribe", "a cat")]
    input_ids, labels = preprocess_conversation(turns, tok,
                                                template="vicuna_v1",
                                                has_image=True)
    assert IMAGE_TOKEN_INDEX in input_ids
    # the image slot is never supervised
    assert labels[list(input_ids).index(IMAGE_TOKEN_INDEX)] == IGNORE_INDEX


def test_anyres_preprocessing():
    """anyres: best-grid selection, pad-resize, patching
    (`llava/mm_utils.py:12-145`)."""
    from faithdiff_tpu.captioner.clip_vision import (divide_to_patches,
                                                     process_anyres_image,
                                                     resize_and_pad_image,
                                                     select_best_resolution)

    grids = [(336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]
    # tall image -> tall grid; wide image -> wide grid
    assert select_best_resolution((300, 900), grids) == (336, 1008)
    assert select_best_resolution((900, 300), grids) == (1008, 336)

    img = np.random.default_rng(0).integers(
        0, 255, (200, 400, 3)).astype(np.uint8)
    padded = resize_and_pad_image(img, (672, 336))
    assert padded.shape == (336, 672, 3)
    patches = divide_to_patches(padded, 336)
    assert len(patches) == 2 and patches[0].shape == (336, 336, 3)

    stack = process_anyres_image(img, 336, grids)
    # base + 2 patches, CLIP-normalised
    assert stack.shape == (3, 336, 336, 3)
    assert np.isfinite(stack).all()
