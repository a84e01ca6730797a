"""Prefetching data loaders: ordering, determinism, error propagation."""
import time

import numpy as np
import pytest

from faithdiff_tpu.data.prefetch import ParallelSampleLoader, PrefetchIterator


def test_prefetch_iterator_preserves_order_and_finishes():
    with PrefetchIterator(iter(range(20)), depth=3) as it:
        assert list(it) == list(range(20))


def test_prefetch_iterator_overlaps_producer():
    def slow_gen():
        for i in range(4):
            time.sleep(0.1)
            yield i

    it = PrefetchIterator(slow_gen(), depth=4)
    first = next(it)                 # producer keeps filling behind this
    time.sleep(0.45)
    t0 = time.time()
    rest = [next(it) for _ in range(3)]
    assert time.time() - t0 < 0.2    # already buffered
    assert [first] + rest == [0, 1, 2, 3]
    it.close()


def test_prefetch_iterator_propagates_exceptions():
    def bad_gen():
        yield 1
        raise ValueError("boom")

    it = PrefetchIterator(bad_gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


class _FakeDataset:
    """Indexable dataset whose samples record (idx, rng draw)."""

    def __len__(self):
        return 100

    def __getitem__(self, i, rng=None):
        time.sleep(0.005)
        return (i, rng.random() if rng is not None else -1.0)


def _collate(samples):
    return {"idx": np.asarray([s[0] for s in samples]),
            "draw": np.asarray([s[1] for s in samples])}


def test_parallel_loader_deterministic_across_worker_counts():
    batches_1 = []
    with ParallelSampleLoader(_FakeDataset(), 4, _collate, seed=7,
                              num_workers=1) as ld:
        for _ in range(3):
            batches_1.append(next(ld))
    batches_8 = []
    with ParallelSampleLoader(_FakeDataset(), 4, _collate, seed=7,
                              num_workers=8) as ld:
        for _ in range(3):
            batches_8.append(next(ld))
    for a, b in zip(batches_1, batches_8):
        np.testing.assert_array_equal(a["idx"], b["idx"])
        np.testing.assert_array_equal(a["draw"], b["draw"])
    # different seeds draw differently
    with ParallelSampleLoader(_FakeDataset(), 4, _collate, seed=8,
                              num_workers=8) as ld:
        other = next(ld)
    assert not np.array_equal(other["idx"], batches_1[0]["idx"]) or \
        not np.array_equal(other["draw"], batches_1[0]["draw"])


def test_runner_dataset_batches_with_workers(tmp_path):
    """The runner's parallel data path yields well-formed batches."""
    import argparse

    from PIL import Image

    from faithdiff_tpu.training.runner import _dataset_batches

    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    cap_dir = tmp_path / "cap"
    for d in (hr_dir, lr_dir, cap_dir):
        d.mkdir()
    r = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(np.uint8(r.uniform(size=(64, 64, 3)) * 255)).save(
            hr_dir / f"{i}.png")
        Image.fromarray(np.uint8(r.uniform(size=(16, 16, 3)) * 255)).save(
            lr_dir / f"{i}.png")
        (cap_dir / f"{i}.txt").write_text(f"caption {i}")

    args = argparse.Namespace(
        hr_dir=str(hr_dir), lr_dir=str(lr_dir), caption_dir=str(cap_dir),
        resolution=32, seed=0, train_batch_size=2, embeds_dir=None,
        text_encoder_dir=None, tokenizer_dir=None,
        dataloader_workers=3, prefetch_depth=2)
    it = _dataset_batches(args, cross_dim=32, pooled_dim=16)
    b = next(it)
    assert b["hr"].shape == (2, 32, 32, 3)
    assert b["lq"].shape == (2, 32, 32, 3)
    assert b["prompt_embeds"].shape[0] == 2
    assert b["pooled_embeds"].shape == (2, 16)
