"""Native LPIPS: backbone taps, converter, metric properties."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from faithdiff_tpu.eval.lpips import (LPIPS, convert_lpips,
                                      load_lpips_params, make_lpips,
                                      save_lpips_params)


def _rand_backbone_sd(net, rng):
    """torchvision-naming state dict with random weights."""
    sd = {}
    if net == "alex":
        specs = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
                 (256, 256, 3)]
        layer_ids = [0, 3, 6, 8, 10]
    else:
        chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512,
                 512]
        specs, layer_ids, prev, lid = [], [], 3, 0
        for i, c in enumerate(chans):
            specs.append((c, prev, 3))
            layer_ids.append(lid)
            prev = c
            lid += 2
            if i in (1, 3, 6, 9):  # maxpool positions in VGG16.features
                lid += 1
    for (o, i, k), lid in zip(specs, layer_ids):
        sd[f"features.{lid}.weight"] = rng.standard_normal(
            (o, i, k, k)).astype(np.float32) * 0.05
        sd[f"features.{lid}.bias"] = np.zeros(o, np.float32)
    return sd


def _rand_lin_sd(net, rng):
    chans = ([64, 192, 384, 256, 256] if net == "alex"
             else [64, 128, 256, 512, 512])
    return {f"lin{i}.model.1.weight":
            np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32)
            for i, c in enumerate(chans)}


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_convert_structure_matches_init(net):
    rng = np.random.default_rng(0)
    params = convert_lpips(_rand_backbone_sd(net, rng),
                           _rand_lin_sd(net, rng), net=net)
    model = LPIPS(net=net)
    x = jnp.zeros((1, 64, 64, 3))
    want = model.init(jax.random.PRNGKey(0), x, x)["params"]
    got = jax.tree.map(jnp.asarray, params)
    assert (jax.tree_util.tree_structure(want)
            == jax.tree_util.tree_structure(got))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(want)[0],
            jax.tree_util.tree_flatten_with_path(got)[0]):
        assert a.shape == b.shape, (pa, a.shape, b.shape)


def test_lpips_matches_torch_reference_math():
    """Our LPIPS forward vs a torch re-implementation of the metric math
    on the same random AlexNet weights."""
    rng = np.random.default_rng(1)
    backbone_sd = _rand_backbone_sd("alex", rng)
    lin_sd = _rand_lin_sd("alex", rng)
    params = convert_lpips(backbone_sd, lin_sd, net="alex")
    model = LPIPS(net="alex")
    a = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    got = float(model.apply({"params": jax.tree.map(jnp.asarray, params)},
                            jnp.asarray(a), jnp.asarray(b))[0])

    # torch reference
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        taps = []
        layer_ids = [0, 3, 6, 8, 10]
        specs = [(11, 4, 2), (5, 1, 2), (3, 1, 1), (3, 1, 1), (3, 1, 1)]
        pools_before = [False, True, True, False, False]
        for lid, (k, s, p), pool in zip(layer_ids, specs, pools_before):
            if pool:
                x = torch.nn.functional.max_pool2d(x, 3, 2)
            w = torch.tensor(backbone_sd[f"features.{lid}.weight"])
            bias = torch.tensor(backbone_sd[f"features.{lid}.bias"])
            x = torch.nn.functional.conv2d(x, w, bias, stride=s, padding=p)
            x = torch.relu(x)
            taps.append(x)
        return taps

    ta = torch.tensor(a).permute(0, 3, 1, 2)
    tb = torch.tensor(b).permute(0, 3, 1, 2)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(feats(ta), feats(tb))):
        na = xa / (xa.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
        nb = xb / (xb.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
        diff = (na - nb).pow(2)
        w = torch.tensor(lin_sd[f"lin{i}.model.1.weight"]).clamp(min=0)
        d = torch.nn.functional.conv2d(diff, w)
        total += d.mean(dim=(2, 3)).item()
    assert abs(got - total) < 5e-4, (got, total)


def test_lpips_properties_and_weights_gating(tmp_path):
    rng = np.random.default_rng(2)
    params = convert_lpips(_rand_backbone_sd("alex", rng),
                           _rand_lin_sd("alex", rng), net="alex")
    path = str(tmp_path / "lpips_alex.npz")
    save_lpips_params(params, path)
    fn = make_lpips(path, net="alex")
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    other = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert fn(img, img) < 1e-6          # identical -> 0
    assert fn(img, other) > 0.0
    # round-trip save/load preserved values
    loaded = load_lpips_params(path)
    assert set(loaded) == set("backbone lin0 lin1 lin2 lin3 lin4".split())
    # gating: absent weights -> None
    assert make_lpips(str(tmp_path / "missing.npz")) is None


def test_metrics_harness_uses_native_lpips(tmp_path):
    from PIL import Image

    from faithdiff_tpu.eval.metrics import evaluate_dirs

    rng = np.random.default_rng(3)
    params = convert_lpips(_rand_backbone_sd("alex", rng),
                           _rand_lin_sd("alex", rng), net="alex")
    wpath = str(tmp_path / "lpips_alex.npz")
    save_lpips_params(params, wpath)
    sr, gt = tmp_path / "sr", tmp_path / "gt"
    sr.mkdir(); gt.mkdir()
    for i in range(2):
        a = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        b = np.clip(a + rng.integers(-20, 20, a.shape), 0, 255).astype(np.uint8)
        Image.fromarray(a).save(sr / f"{i}.png")
        Image.fromarray(b).save(gt / f"{i}.png")
    means = evaluate_dirs(str(sr), str(gt), use_learned=False,
                          lpips_weights=wpath)
    assert "lpips" in means and np.isfinite(means["lpips"])
    assert means["_unavailable"].get("lpips") is None
