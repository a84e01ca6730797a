"""Native PaQ-2-PiQ vs a torch mirror of the RoIPoolModel layout."""
import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from faithdiff_tpu.eval.lpips import save_lpips_params
from faithdiff_tpu.eval.paq2piq import (PaQ2PiQ, convert_paq2piq,
                                        make_paq2piq, roi_scores)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.bn2(self.conv2(torch.relu(self.bn1(self.conv1(x)))))
        return torch.relu(idn + y)


class AdaptiveConcatPool2d(tnn.Module):
    def forward(self, x):
        return torch.cat([tnn.functional.adaptive_max_pool2d(x, 1),
                          tnn.functional.adaptive_avg_pool2d(x, 1)], 1)


def _layer(cin, cout, stride):
    return tnn.Sequential(TorchBasicBlock(cin, cout, stride),
                          TorchBasicBlock(cout, cout))


class TorchRoIPoolModel(tnn.Module):
    """torchvision-resnet18-children body + the original fastai head."""

    def __init__(self):
        super().__init__()
        self.body = tnn.Sequential(
            tnn.Conv2d(3, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64),
            tnn.ReLU(), tnn.MaxPool2d(3, 2, 1),
            _layer(64, 64, 1), _layer(64, 128, 2),
            _layer(128, 256, 2), _layer(256, 512, 2))
        self.head = tnn.Sequential(
            AdaptiveConcatPool2d(), tnn.Flatten(), tnn.BatchNorm1d(1024),
            tnn.Dropout(0.25), tnn.Linear(1024, 512), tnn.ReLU(),
            tnn.BatchNorm1d(512), tnn.Dropout(0.5), tnn.Linear(512, 1))

    def forward(self, x):
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        return self.head(self.body((x - mean) / std))[:, 0]


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            m.running_mean.copy_(torch.tensor(
                rng.standard_normal(m.running_mean.shape) * 0.3,
                dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rng.uniform(0.5, 1.5, m.running_var.shape),
                dtype=torch.float32))


def test_paq2piq_matches_torch_mirror(tmp_path):
    torch.manual_seed(0)
    tm = TorchRoIPoolModel().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, np.random.default_rng(7))
    params = convert_paq2piq(
        {k: v.numpy() for k, v in tm.state_dict().items()})

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 96, 3)).astype(np.float32)
    got = float(PaQ2PiQ().apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(img)[None])[0])
    with torch.no_grad():
        want = float(tm(torch.tensor(img[None]).permute(0, 3, 1, 2))[0])
    assert abs(got - want) < 1e-3, (got, want)

    # RoI branch: grid of patch scores from the same trunk
    grid = roi_scores(jax.tree.map(jnp.asarray, params), img, grid=(2, 3))
    assert grid.shape == (2, 3) and np.isfinite(grid).all()

    # weights gating
    wpath = str(tmp_path / "paq2piq.npz")
    save_lpips_params(params, wpath)
    fn = make_paq2piq(wpath)
    assert fn is not None and abs(fn(img) - want) < 1e-3
    assert make_paq2piq(str(tmp_path / "missing.npz")) is None
