"""Native NIQE and FID harness tests (reference protocol:
`/root/reference/test_metrics.py:127-141,195-227`)."""
import numpy as np
import pytest

from faithdiff_tpu.eval.fid import (InceptionV3Features, activation_statistics,
                                    convert_inception, fid_from_features,
                                    frechet_distance)
from faithdiff_tpu.eval.niqe import (fit_aggd, fit_mvg, fit_niqe_params,
                                     load_niqe_params, mscn, niqe,
                                     niqe_features)


# ---------------------------------------------------------------------------
# NIQE
# ---------------------------------------------------------------------------

def test_aggd_fit_gaussian_alpha_two():
    """A symmetric Gaussian sample is an AGGD with alpha=2 and equal betas."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(200_000)
    alpha, bl, br = fit_aggd(x)
    assert 1.8 <= alpha <= 2.2, alpha
    assert abs(bl - br) / bl < 0.05
    # beta for a unit gaussian: sigma * sqrt(gamma(1/2)/gamma(3/2)) ~ 1.41
    assert 1.2 <= bl <= 1.6, bl


def test_aggd_fit_laplacian_alpha_one():
    rng = np.random.default_rng(1)
    x = rng.laplace(size=200_000)
    alpha, _, _ = fit_aggd(x)
    assert 0.85 <= alpha <= 1.15, alpha


def test_mscn_whitens():
    """MSCN coefficients of a natural-ish texture have ~0 mean, ~unit-ish
    local deviation."""
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.uniform(0, 255, (256, 256)), 3.0)
    m = mscn(img)
    assert abs(m.mean()) < 0.1
    assert 0.1 < m.std() < 2.0


def _textures(n, size=384, seed=0):
    """Natural-statistics-ish pristine textures: multi-scale filtered noise."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        img = np.zeros((size, size))
        for s, w in ((1, 0.3), (4, 0.4), (16, 0.3)):
            img += w * gaussian_filter(rng.standard_normal((size, size)), s)
        img = (img - img.min()) / (img.max() - img.min()) * 255
        out.append(np.repeat(img[..., None], 3, axis=-1).astype(np.float32))
    return out


def test_niqe_ranks_distortions(tmp_path):
    """Fit the pristine MVG on clean textures; heavy noise and blur must
    score worse (higher) than a held-out clean texture."""
    pristine = _textures(5, seed=0)
    mu, cov = fit_niqe_params(pristine[:4],
                              save_path=str(tmp_path / "params.npz"))
    mu2, cov2, patch = load_niqe_params(str(tmp_path / "params.npz"))
    np.testing.assert_allclose(mu, mu2)
    assert patch == 96

    clean = pristine[4]
    rng = np.random.default_rng(9)
    noisy = np.clip(clean + rng.standard_normal(clean.shape) * 50, 0, 255)
    from scipy.ndimage import uniform_filter

    blurred = uniform_filter(clean, size=(15, 15, 1))

    s_clean = niqe(clean, mu, cov)
    s_noisy = niqe(noisy, mu, cov)
    s_blur = niqe(blurred, mu, cov)
    assert s_noisy > s_clean, (s_noisy, s_clean)
    assert s_blur > s_clean, (s_blur, s_clean)


def test_niqe_features_shape():
    f = niqe_features(_textures(1, size=192)[0])
    assert f.shape == (4, 36)  # 2x2 patches of 96, 18 features x 2 scales


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------

def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((500, 16))
    mu, cov = activation_statistics(f)
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_analytic_isotropic():
    """For N(m1, a I) vs N(m2, b I): d^2 = |m1-m2|^2 + D (a + b - 2 sqrt(ab))."""
    d = 8
    m1, m2 = np.zeros(d), np.full(d, 2.0)
    c1, c2 = np.eye(d) * 4.0, np.eye(d) * 9.0
    expected = 4.0 * d + d * (4 + 9 - 2 * 6)
    assert frechet_distance(m1, c1, m2, c2) == pytest.approx(expected, rel=1e-6)


def test_fid_from_features_separates_distributions():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((400, 32))
    b = rng.standard_normal((400, 32)) + 3.0
    same = fid_from_features(a, rng.standard_normal((400, 32)))
    diff = fid_from_features(a, b)
    assert diff > same + 5.0


def test_inception_graph_output_shape():
    import jax
    import jax.numpy as jnp

    model = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 2048)


def test_convert_inception_naming():
    import torch

    sd = {
        "Conv2d_1a_3x3.conv.weight": torch.randn(32, 3, 3, 3),
        "Conv2d_1a_3x3.bn.weight": torch.randn(32),
        "Conv2d_1a_3x3.bn.bias": torch.randn(32),
        "Conv2d_1a_3x3.bn.running_mean": torch.randn(32),
        "Conv2d_1a_3x3.bn.running_var": torch.rand(32) + 0.5,
        "Conv2d_1a_3x3.bn.num_batches_tracked": torch.tensor(0),
        "Mixed_5b.branch5x5_1.conv.weight": torch.randn(48, 192, 1, 1),
        "Mixed_5b.branch5x5_1.bn.weight": torch.randn(48),
        "fc.weight": torch.randn(1000, 2048),       # dropped
        "AuxLogits.fc.weight": torch.randn(1000, 768),  # dropped
    }
    tree = convert_inception(sd)
    assert tree["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert set(tree["Conv2d_1a_3x3"]) == {"conv", "bn_scale", "bn_bias",
                                          "bn_mean", "bn_var"}
    assert tree["Mixed_5b"]["branch5x5_1"]["conv"]["kernel"].shape == (1, 1, 192, 48)
    assert "fc" not in tree and "AuxLogits" not in tree


def test_inception_matches_bn_eval_semantics():
    """BasicConv2d must implement eval-mode BN: y = (x-mean)/sqrt(var+eps)
    * scale + bias, relu'd."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from faithdiff_tpu.eval.fid import BasicConv2d

    w = torch.randn(8, 4, 3, 3)
    scale, bias = torch.randn(8), torch.randn(8)
    mean, var = torch.randn(8), torch.rand(8) + 0.5
    x = torch.randn(2, 4, 9, 9)
    ref = F.conv2d(x, w)
    ref = (ref - mean[:, None, None]) / torch.sqrt(var[:, None, None] + 1e-3) \
        * scale[:, None, None] + bias[:, None, None]
    ref = F.relu(ref)

    params = {"params": {
        "conv": {"kernel": w.numpy().transpose(2, 3, 1, 0)},
        "bn_scale": scale.numpy(), "bn_bias": bias.numpy(),
        "bn_mean": mean.numpy(), "bn_var": var.numpy()}}
    ours = BasicConv2d(8, (3, 3)).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1), atol=2e-5)


# ---------------------------------------------------------------------------
# harness availability reporting
# ---------------------------------------------------------------------------

def test_harness_reports_every_reference_metric(tmp_path, capsys):
    from PIL import Image

    from faithdiff_tpu.eval.metrics import REFERENCE_METRICS, evaluate_dirs

    sr, gt = tmp_path / "sr", tmp_path / "gt"
    sr.mkdir(), gt.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        Image.fromarray(img).save(sr / f"{i}.png")
        Image.fromarray(np.clip(img + 5, 0, 255).astype(np.uint8)).save(
            gt / f"{i}.png")
    means = evaluate_dirs(str(sr), str(gt), use_learned=False)
    out = capsys.readouterr().out
    for m in REFERENCE_METRICS:
        assert f"[metric] {m}:" in out
    # psnr/ssim computed; learned ones explicitly unavailable
    assert "psnr" in means and "ssim" in means
    unavailable = means["_unavailable"]
    assert "musiq" in unavailable and "UNAVAILABLE" in unavailable["musiq"]
    assert "lpips" in unavailable
