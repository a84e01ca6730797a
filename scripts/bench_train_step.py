"""Measure the stage-1 training step (fwd+bwd) on the real TPU chip.

VERDICT round-1 weak #2: "training step cost never measured on TPU". This
drives `training.train.make_train_step` at the full SDXL scale on one v5e
chip: stage-1 (adapter-only) recipe, 512px crops (the reference's training
resolution, `train_stage_1.sh`), bf16 params + activations, remat on the
UNet blocks. Fits one chip because the step differentiates and EMA-tracks
ONLY the trainable partition (`train.partition_params`) — the full-tree
version OOM'd at 20.1 GB (frozen-grad buffers + fp32 full EMA shadow).

Usage: python scripts/bench_train_step.py [--batch 4] [--iters 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--no_remat", action="store_true",
                    help="store activations instead of recomputing — the "
                    "trainable-partition split freed enough HBM to try")
    args = ap.parse_args()
    assert jax.devices()[0].platform == "tpu", jax.devices()

    import dataclasses

    from faithdiff_tpu.config import (DenoiseEncoderConfig, SchedulerConfig,
                                      TrainConfig, UNetConfig, VAEConfig)
    from faithdiff_tpu.models.unet import UNet2DConditionModel
    from faithdiff_tpu.models.vae import (AutoencoderKL, DenoiseEncoder,
                                          sample_from_moments)
    from faithdiff_tpu.training.train import init_train_state, make_train_step

    dtype = jnp.bfloat16
    ucfg = dataclasses.replace(UNetConfig(), remat=not args.no_remat)
    unet = UNet2DConditionModel(config=ucfg, dtype=dtype)
    de = DenoiseEncoder(config=DenoiseEncoderConfig(), dtype=dtype)
    vcfg = VAEConfig()
    vae = AutoencoderKL(config=vcfg, dtype=dtype)

    b, s = args.batch, args.res
    lat = s // 8
    rng = jax.random.PRNGKey(0)
    print("initialising params...", flush=True)
    unet_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, lat, lat, 4), dtype), jnp.zeros((1,)),
        jnp.zeros((1, 77, ucfg.cross_attention_dim), dtype),
        jnp.zeros((1, 1280), dtype), jnp.zeros((1, 6)),
        jnp.zeros((1, lat, lat, ucfg.condition_channels), dtype))
    de_params = jax.jit(de.init)(rng, jnp.zeros((1, s, s, 3), dtype))
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3), dtype))
    # bf16 storage: params + (full-tree) grads must fit one chip
    unet_params = jax.tree.map(lambda p: p.astype(dtype), unet_params)
    de_params = jax.tree.map(lambda p: p.astype(dtype), de_params)
    vae_params = jax.tree.map(lambda p: p.astype(dtype), vae_params)

    cfg = TrainConfig(stage=args.stage, max_train_steps=100,
                      lr_warmup_steps=0)
    state, tx = init_train_state(cfg, unet_params, de_params)

    def vae_encode(p, img, key):
        m = vae.apply(p, img, method=AutoencoderKL.encode_moments)
        return (sample_from_moments(m, key).astype(jnp.float32)
                * vcfg.scaling_factor)

    def unet_apply(p, *a):
        return unet.apply(p, *a[:6], add_sample=a[6], fusion_group_size=a[7])

    step = make_train_step(unet_apply, lambda p, x: de.apply(p, x),
                           vae_encode, vae_params, tx, cfg,
                           SchedulerConfig())

    r = np.random.default_rng(0)
    batch = {
        "hr": jnp.asarray(r.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "lq": jnp.asarray(r.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "prompt_embeds": jnp.asarray(
            r.standard_normal((b, 77, ucfg.cross_attention_dim)) * 0.02,
            jnp.float32),
        "pooled_embeds": jnp.asarray(
            r.standard_normal((b, 1280)) * 0.02, jnp.float32),
        "add_time_ids": jnp.tile(
            jnp.asarray([[512, 512, 0, 0, 512, 512]], jnp.float32), (b, 1)),
    }

    jstep = jax.jit(step, donate_argnums=(0,))
    print("compiling train step (fwd+bwd)...", flush=True)
    t0 = time.perf_counter()
    compiled = jstep.lower(state, batch, jax.random.PRNGKey(1)).compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0))
    print(f"cost_analysis: {flops / 1e12:.2f} TF/step, "
          f"{float(cost.get('bytes accessed', 0.0)) / 1e9:.1f} GB accessed",
          flush=True)
    state, metrics = jstep(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    print(f"compile+first step {time.perf_counter() - t0:.1f}s "
          f"loss={loss:.4f}", flush=True)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = jstep(state, batch, jax.random.PRNGKey(2 + i))
    loss = float(metrics["loss"])  # readback = sync
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    eff_batch = 256  # reference recipe: 16/dev x 4 dev x 4 accum
    mfu = flops / (ms / 1e3) / 197e12 * 100 if flops else 0.0
    print(f"stage-{args.stage} train step, batch {b} @ {s}px: "
          f"{ms:.1f} ms/step ({ms / b:.1f} ms/sample) loss={loss:.4f} "
          f"MFU={mfu:.1f}% (incl. remat recompute as useful FLOPs)")
    print(f"-> reference effective batch {eff_batch}: "
          f"{ms / b * eff_batch / 1e3:.1f} s/optimizer-step on ONE chip, "
          f"/8 on a v5e-8 data-parallel mesh")


if __name__ == "__main__":
    main()
