"""Native DISTS: L2 pooling, converter, torch-math parity, harness use."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from faithdiff_tpu.eval.dists import (DISTS, STAGE_CHANNELS, convert_dists,
                                      l2_pool, make_dists)
from faithdiff_tpu.eval.lpips import save_lpips_params


def _rand_dists_sd(rng):
    """DISTS-checkpoint-style state dict (stageN.M.weight VGG convs +
    alpha/beta) with random weights."""
    sd = {}
    chans = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
             (256, 256), (256, 256), (512, 256), (512, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
    per_stage = [2, 2, 3, 3, 3]
    idx = 0
    for stage, n in enumerate(per_stage, start=1):
        lid = 0
        for _ in range(n):
            o, i = chans[idx]
            sd[f"stage{stage}.{lid}.weight"] = rng.standard_normal(
                (o, i, 3, 3)).astype(np.float32) * 0.05
            sd[f"stage{stage}.{lid}.bias"] = np.zeros(o, np.float32)
            lid += 2
            idx += 1
    total_c = sum(STAGE_CHANNELS)
    sd["alpha"] = np.abs(rng.standard_normal(
        (1, total_c, 1, 1))).astype(np.float32)
    sd["beta"] = np.abs(rng.standard_normal(
        (1, total_c, 1, 1))).astype(np.float32)
    return sd


def test_l2_pool_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    got = np.asarray(l2_pool(jnp.asarray(x)))
    # torch reference: hann-weighted avg of squares, sqrt
    a = np.hanning(5)[1:-1]
    w = np.outer(a, a)
    w = (w / w.sum()).astype(np.float32)
    tw = torch.tensor(w).view(1, 1, 3, 3).repeat(4, 1, 1, 1)
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    want = torch.sqrt(torch.nn.functional.conv2d(
        tx ** 2, tw, stride=2, padding=1, groups=4).clamp(min=1e-12))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5)


def test_convert_structure_matches_init():
    rng = np.random.default_rng(1)
    params = convert_dists(_rand_dists_sd(rng))
    model = DISTS()
    x = jnp.zeros((1, 64, 64, 3))
    want = model.init(jax.random.PRNGKey(0), x, x)["params"]
    got = jax.tree.map(jnp.asarray, params)
    assert (jax.tree_util.tree_structure(want)
            == jax.tree_util.tree_structure(got))


def test_dists_matches_torch_reference_math():
    rng = np.random.default_rng(2)
    sd = _rand_dists_sd(rng)
    params = convert_dists(sd)
    a = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    got = float(DISTS().apply({"params": jax.tree.map(jnp.asarray, params)},
                              jnp.asarray(a), jnp.asarray(b))[0])

    # torch re-implementation of the official DISTS forward
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    hann = np.hanning(5)[1:-1]
    w2 = np.outer(hann, hann)
    w2 = torch.tensor((w2 / w2.sum()).astype(np.float32))

    def l2p(x):
        c = x.shape[1]
        k = w2.view(1, 1, 3, 3).repeat(c, 1, 1, 1)
        return torch.sqrt(torch.nn.functional.conv2d(
            x ** 2, k, stride=2, padding=1, groups=c).clamp(min=1e-12))

    def feats(x):
        x = (x - mean) / std
        taps = [x]
        per_stage = [2, 2, 3, 3, 3]
        for stage, n in enumerate(per_stage, start=1):
            if stage > 1:
                x = l2p(x)
            lid = 0
            for _ in range(n):
                w = torch.tensor(sd[f"stage{stage}.{lid}.weight"])
                bias = torch.tensor(sd[f"stage{stage}.{lid}.bias"])
                x = torch.relu(torch.nn.functional.conv2d(
                    x, w, bias, padding=1))
                lid += 2
            taps.append(x)
        return taps

    fa = feats(torch.tensor(a).permute(0, 3, 1, 2))
    fb = feats(torch.tensor(b).permute(0, 3, 1, 2))
    alpha = torch.tensor(sd["alpha"])
    beta = torch.tensor(sd["beta"])
    w_sum = alpha.sum() + beta.sum()
    alphas = torch.split(alpha / w_sum, list(STAGE_CHANNELS), dim=1)
    betas = torch.split(beta / w_sum, list(STAGE_CHANNELS), dim=1)
    c1 = c2 = 1e-6
    dist1 = dist2 = 0.0
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        xm = xa.mean([2, 3], keepdim=True)
        ym = xb.mean([2, 3], keepdim=True)
        s1 = (2 * xm * ym + c1) / (xm ** 2 + ym ** 2 + c1)
        dist1 = dist1 + (alphas[k] * s1).sum(1, keepdim=True)
        xv = ((xa - xm) ** 2).mean([2, 3], keepdim=True)
        yv = ((xb - ym) ** 2).mean([2, 3], keepdim=True)
        cov = (xa * xb).mean([2, 3], keepdim=True) - xm * ym
        s2 = (2 * cov + c2) / (xv + yv + c2)
        dist2 = dist2 + (betas[k] * s2).sum(1, keepdim=True)
    want = float(1 - (dist1 + dist2).squeeze())
    assert abs(got - want) < 5e-4, (got, want)


def test_dists_identity_and_harness(tmp_path):
    from PIL import Image

    from faithdiff_tpu.eval.metrics import evaluate_dirs

    rng = np.random.default_rng(3)
    params = convert_dists(_rand_dists_sd(rng))
    wpath = str(tmp_path / "dists.npz")
    save_lpips_params(params, wpath)
    fn = make_dists(wpath)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert abs(fn(img, img)) < 1e-5
    assert make_dists(str(tmp_path / "absent.npz")) is None

    sr, gt = tmp_path / "sr", tmp_path / "gt"
    sr.mkdir(); gt.mkdir()
    a = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    Image.fromarray(a).save(sr / "0.png")
    Image.fromarray(a).save(gt / "0.png")
    means = evaluate_dirs(str(sr), str(gt), use_learned=False,
                          dists_weights=wpath)
    assert "dists" in means and abs(means["dists"]) < 1e-5
