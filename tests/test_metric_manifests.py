"""Released-checkpoint key-manifest tests for the learned IQA converters.

Round-2 missing #4: the converters were exercised only against hand-written
torch mirrors, so a layout mismatch vs the RELEASED checkpoints
(torchvision / lpips package / DISTS official / pyiqa) would surface at
weight-load time. Each manifest under `tests/manifests/` records a released
checkpoint's FULL key set + shapes (see `scripts/gen_metric_manifests.py`
for provenance); these tests synthesize random state dicts with EXACTLY
those keys and prove each `convert_*` produces a scoring network.

Reference scoring protocol: `/root/reference/test_metrics.py:127-141`.
"""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "manifests")


def synth_state_dict(name: str, seed: int = 0):
    """Random state dict with exactly the manifest's keys/shapes.

    Conv/1D tensors draw small gaussians; running_var is positive;
    >10M-element tensors (unused classifier heads) stay zero (cheap)."""
    with open(os.path.join(MANIFEST_DIR, name)) as f:
        manifest = json.load(f)
    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in manifest.items():
        if shape == "int64":
            sd[key] = np.zeros((), np.int64)
        elif key.endswith("running_var"):
            sd[key] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        elif int(np.prod(shape)) > 10_000_000:
            sd[key] = np.zeros(shape, np.float32)
        else:
            sd[key] = (rng.standard_normal(shape) * 0.05).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(1).uniform(size=(64, 80, 3)) \
        .astype(np.float32)


@pytest.mark.parametrize("net,backbone,lin", [
    ("alex", "torchvision_alexnet.json", "lpips_lin_alex.json"),
    ("vgg", "torchvision_vgg16.json", "lpips_lin_vgg.json"),
])
def test_lpips_from_released_layouts(net, backbone, lin, img):
    from faithdiff_tpu.eval.lpips import LPIPS, convert_lpips

    params = convert_lpips(synth_state_dict(backbone),
                           synth_state_dict(lin), net=net)
    a = jnp.asarray(img)[None] * 2.0 - 1.0
    b = jnp.roll(a, 3, axis=2)
    d = LPIPS(net=net).apply({"params": params}, a, b)
    assert d.shape == (1,) and np.isfinite(float(d[0]))
    # identical inputs -> zero distance (sanity that features flow)
    z = LPIPS(net=net).apply({"params": params}, a, a)
    assert abs(float(z[0])) < 1e-6


def test_dists_from_official_layout(img):
    from faithdiff_tpu.eval.dists import DISTS, convert_dists

    params = convert_dists(synth_state_dict("dists_official.json"))
    a = jnp.asarray(img)[None]
    d = DISTS().apply({"params": params}, a, jnp.roll(a, 3, axis=2))
    assert np.isfinite(float(d[0]))


def test_paq2piq_from_pyiqa_layout(img):
    import jax

    from faithdiff_tpu.eval.paq2piq import PaQ2PiQ, convert_paq2piq

    params = convert_paq2piq(synth_state_dict("pyiqa_paq2piq.json"))
    score = PaQ2PiQ().apply({"params": jax.tree.map(jnp.asarray, params)},
                            jnp.asarray(img)[None])
    assert np.isfinite(float(score[0]))


def test_inception_tolerates_fc_and_auxlogits():
    """The released pytorch-fid / torchvision checkpoints carry `fc.*` and
    `AuxLogits.*` keys the feature extractor must skip, plus
    num_batches_tracked scalars."""
    from faithdiff_tpu.eval.fid import convert_inception

    sd = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.ones((32,), np.float32),
        "Conv2d_1a_3x3.bn.bias": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones((32,), np.float32),
        "Conv2d_1a_3x3.bn.num_batches_tracked": np.zeros((), np.int64),
        "fc.weight": np.zeros((1008, 2048), np.float32),
        "fc.bias": np.zeros((1008,), np.float32),
        "AuxLogits.conv0.conv.weight": np.zeros((128, 768, 1, 1),
                                                np.float32),
        "AuxLogits.conv0.bn.weight": np.ones((128,), np.float32),
    }
    tree = convert_inception(sd)
    assert "fc" not in tree and "AuxLogits" not in tree
    assert tree["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)


def test_musiq_key_map_rename_pass():
    """`convert_musiq(key_map=...)` converts a foreign-named checkpoint via
    a recorded rename manifest (round-2 missing #4: the promised key-rename
    pass for released TF/pyiqa MUSIQ exports)."""
    import torch

    from faithdiff_tpu.eval.musiq import MUSIQConfig, convert_musiq
    from test_musiq import CFG, TorchMUSIQ

    torch.manual_seed(0)
    tm = TorchMUSIQ(CFG).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # a foreign layout: every key prefixed (as a released export might be)
    foreign = {f"model.{k}": v for k, v in sd.items()}
    key_map = {f"model.{k}": k for k in sd}
    a = convert_musiq(sd, CFG)
    b = convert_musiq(foreign, CFG, key_map=key_map)
    import jax

    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(la, lb)


def test_maniqa_from_official_dims_manifest():
    """MANIQA converter against the official-architecture key set at FULL
    dims (vit_base/patch8/224 + dual swin stages — the released
    MANIQA-PIPAL layout; manifest generated from the parity mirror at
    default config, `scripts/gen_metric_manifests.py` provenance notes)."""
    import jax

    from faithdiff_tpu.eval.maniqa import MANIQA, MANIQAConfig, convert_maniqa

    cfg = MANIQAConfig()
    params = convert_maniqa(synth_state_dict("maniqa_official.json"), cfg)
    crop = np.random.default_rng(2).uniform(
        size=(1, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    score = MANIQA(cfg).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(crop))
    assert np.isfinite(float(score[0]))
