"""Generate released-checkpoint KEY MANIFESTS for the learned IQA metric
converters (round-2 missing #4): each manifest is the FULL key set + tensor
shape of a released torch checkpoint, recorded as a JSON fixture under
`tests/manifests/`. `tests/test_metric_manifests.py` synthesizes random
state dicts with EXACTLY these keys and proves each `convert_*` produces a
working scoring network from them — so a layout mismatch surfaces in CI,
not at weight-load time.

Recorded layouts (structure encoded here, shapes derived from the published
architectures):
- torchvision AlexNet / VGG16 `state_dict()` (features + classifier) — the
  LPIPS backbones (torchvision model zoo layout).
- lpips package `lin` heads (`lin{i}.model.1.weight`, the official
  richzhang/PerceptualSimilarity v0.1 export).
- DISTS official `weights.pt` merged with its VGG16 module layout
  (`stage{1..5}.<seq-idx>.weight` + `alpha`/`beta` [1, 1475, 1, 1] —
  dingkeyan93/DISTS).
- pyiqa PaQ2PiQ `RoIPoolModel-fit.10.bs.120.pth`: fastai resnet18 body
  (`body.*`) + concat-pool head (`head.{1,3,5,7}`).

Additionally `tests/manifests/maniqa_official.json` (236 keys) is generated
from the parity mirror `tests/test_maniqa.TorchMANIQA` at DEFAULT config —
the official MANIQA architecture dims (timm vit_base_patch8_224 naming +
dual swin stages + fc_score/fc_weight heads, the MANIQA-PIPAL release
layout).

The reference scores these metrics through pyiqa on CUDA
(`/root/reference/test_metrics.py:127-141`).
"""
from __future__ import annotations

import json
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "manifests")

INT64 = "int64"   # num_batches_tracked


def conv(o, i, k):
    return [o, i, k, k]


def bn(manifest, prefix, c):
    manifest[f"{prefix}.weight"] = [c]
    manifest[f"{prefix}.bias"] = [c]
    manifest[f"{prefix}.running_mean"] = [c]
    manifest[f"{prefix}.running_var"] = [c]
    manifest[f"{prefix}.num_batches_tracked"] = INT64


def alexnet():
    m = {}
    convs = [(0, 64, 3, 11), (3, 192, 64, 5), (6, 384, 192, 3),
             (8, 256, 384, 3), (10, 256, 256, 3)]
    for idx, o, i, k in convs:
        m[f"features.{idx}.weight"] = conv(o, i, k)
        m[f"features.{idx}.bias"] = [o]
    for idx, o, i in [(1, 4096, 9216), (4, 4096, 4096), (6, 1000, 4096)]:
        m[f"classifier.{idx}.weight"] = [o, i]
        m[f"classifier.{idx}.bias"] = [o]
    return m


VGG16_CONVS = [(0, 64, 3), (2, 64, 64), (5, 128, 64), (7, 128, 128),
               (10, 256, 128), (12, 256, 256), (14, 256, 256),
               (17, 512, 256), (19, 512, 512), (21, 512, 512),
               (24, 512, 512), (26, 512, 512), (28, 512, 512)]


def vgg16():
    m = {}
    for idx, o, i in VGG16_CONVS:
        m[f"features.{idx}.weight"] = conv(o, i, 3)
        m[f"features.{idx}.bias"] = [o]
    for idx, o, i in [(0, 4096, 25088), (3, 4096, 4096), (6, 1000, 4096)]:
        m[f"classifier.{idx}.weight"] = [o, i]
        m[f"classifier.{idx}.bias"] = [o]
    return m


def lpips_lin(channels):
    return {f"lin{i}.model.1.weight": [1, c, 1, 1]
            for i, c in enumerate(channels)}


def dists():
    # DISTS VGG16 as stage-sequentials: stage1 = (conv relu conv relu),
    # stage2+ prepend a maxpool, so conv indices shift by one
    m = {}
    stages = [
        ("stage1", [(0, 64, 3), (2, 64, 64)]),
        ("stage2", [(1, 128, 64), (3, 128, 128)]),
        ("stage3", [(1, 256, 128), (3, 256, 256), (5, 256, 256)]),
        ("stage4", [(1, 512, 256), (3, 512, 512), (5, 512, 512)]),
        ("stage5", [(1, 512, 512), (3, 512, 512), (5, 512, 512)]),
    ]
    for stage, convs in stages:
        for idx, o, i in convs:
            m[f"{stage}.{idx}.weight"] = conv(o, i, 3)
            m[f"{stage}.{idx}.bias"] = [o]
    total = 3 + 64 + 128 + 256 + 512 + 512            # input stage included
    m["alpha"] = [1, total, 1, 1]
    m["beta"] = [1, total, 1, 1]
    return m


def paq2piq():
    m = {"body.0.weight": conv(64, 3, 7)}
    bn(m, "body.1", 64)
    chans = [64, 128, 256, 512]
    for s, c in enumerate(chans):
        prev = chans[s - 1] if s else 64
        for b in range(2):
            p = f"body.{4 + s}.{b}"
            cin = prev if b == 0 else c
            m[f"{p}.conv1.weight"] = conv(c, cin, 3)
            bn(m, f"{p}.bn1", c)
            m[f"{p}.conv2.weight"] = conv(c, c, 3)
            bn(m, f"{p}.bn2", c)
            if b == 0 and s > 0:                      # strided shortcut
                m[f"{p}.downsample.0.weight"] = conv(c, prev, 1)
                bn(m, f"{p}.downsample.1", c)
    # fastai head: 0 AdaptiveConcatPool2d, 1 BN1d, 2 Dropout, 3 Linear,
    # 4 ReLU, 5 BN1d, 6 Dropout, 7 Linear
    bn(m, "head.1", 1024)
    m["head.3.weight"] = [512, 1024]
    m["head.3.bias"] = [512]
    bn(m, "head.5", 512)
    m["head.7.weight"] = [1, 512]
    m["head.7.bias"] = [1]
    return m


def main():
    os.makedirs(OUT, exist_ok=True)
    manifests = {
        "torchvision_alexnet.json": alexnet(),
        "torchvision_vgg16.json": vgg16(),
        "lpips_lin_alex.json": lpips_lin([64, 192, 384, 256, 256]),
        "lpips_lin_vgg.json": lpips_lin([64, 128, 256, 512, 512]),
        "dists_official.json": dists(),
        "pyiqa_paq2piq.json": paq2piq(),
    }
    for name, m in manifests.items():
        path = os.path.join(OUT, name)
        with open(path, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        print(f"wrote {path}: {len(m)} keys")


if __name__ == "__main__":
    main()
