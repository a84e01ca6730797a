"""Training runner: the `train_SDXL_stage_{1,2}.py` equivalent.

Wires dataset -> degradation -> precomputed text embeds -> pjit train step
-> EMA -> orbax checkpoints -> periodic validation, on a `data` mesh
(SURVEY.md §3.2 call stack, rebuilt TPU-first).
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (DenoiseEncoderConfig, SchedulerConfig, TrainConfig,
                      UNetConfig, VAEConfig)
from ..models.unet import UNet2DConditionModel
from ..models.vae import AutoencoderKL, DenoiseEncoder, sample_from_moments
from ..parallel.mesh import (batch_sharding, make_mesh, replicated,
                             shard_leading_divisible)
from .checkpoint import CheckpointManager, load_params
from .train import TrainState, init_train_state, make_train_step


def parse_args(argv=None) -> argparse.Namespace:
    """CLI mirroring the reference trainer flags
    (`train_SDXL_stage_1.py:200-545`, the subset that is used)."""
    p = argparse.ArgumentParser("faithdiff-train")
    p.add_argument("--stage", type=int, choices=[1, 2], default=1)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--hr_dir", default=None)
    p.add_argument("--lr_dir", default=None)
    p.add_argument("--caption_dir", default=None)
    p.add_argument("--embeds_dir", default=None,
                   help="precomputed prompt embeds (.npz per sample)")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--train_batch_size", type=int, default=None,
                   help="per-device batch (default: 16 for stage 1 — the "
                        "reference recipe; 2 for stage 2 — the measured "
                        "v5e memory-fit plan)")
    p.add_argument("--grad_accum", type=int, default=None,
                   help="micro-batch accumulation (default: 4 for stage 1 "
                        "as the reference recipe; 16 for stage 2 so "
                        "batch x devices x accum preserves the reference's "
                        "effective 256)")
    p.add_argument("--remat", type=int, choices=[0, 1], default=None,
                   help="gradient checkpointing for UNet + denoise_encoder "
                        "(default: on for stage 2 — the v5e AOT analysis "
                        "measured stage 2 unfittable without it; off for "
                        "stage 1)")
    p.add_argument("--max_train_steps", type=int, default=6000)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--vis_learning_rate", type=float, default=5e-6)
    p.add_argument("--lr_scheduler", default="cosine")
    p.add_argument("--lr_warmup_steps", type=int, default=300)
    p.add_argument("--noise_offset", type=float, default=0.02)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--ema_update_interval", type=int, default=100)
    p.add_argument("--checkpointing_steps", type=int, default=2000)
    p.add_argument("--checkpoints_total_limit", type=int, default=5)
    p.add_argument("--validation_steps", type=int, default=500)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--val_dir", default=None,
                   help="dir of LQ validation images (RealPhoto60-style)")
    p.add_argument("--val_num_images", type=int, default=4)
    p.add_argument("--pretrained_params_dir", default=None,
                   help="converted SDXL/stage-1 params to start from")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dataloader_workers", type=int, default=4,
                   help="parallel sample-decode threads (0 = synchronous)")
    p.add_argument("--prefetch_depth", type=int, default=2,
                   help="batches prefetched ahead of the device step "
                        "(0 = no background prefetch)")
    p.add_argument("--synthetic_data", action="store_true",
                   help="random data (smoke runs without a dataset)")
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--log_every", type=int, default=10)
    return p.parse_args(argv)


def _synthetic_batches(batch_size: int, res: int, cross_dim: int,
                       pooled_dim: int, seed: int) -> Iterator[dict]:
    rng = np.random.default_rng(seed)
    while True:
        yield {
            "hr": rng.uniform(-1, 1, (batch_size, res, res, 3)).astype(np.float32),
            "lq": rng.uniform(-1, 1, (batch_size, res, res, 3)).astype(np.float32),
            "prompt_embeds": rng.standard_normal(
                (batch_size, 77, cross_dim)).astype(np.float32) * 0.02,
            "pooled_embeds": rng.standard_normal(
                (batch_size, pooled_dim)).astype(np.float32) * 0.02,
            "add_time_ids": np.tile(
                np.asarray([res, res, 0, 0, res, res], np.float32),
                (batch_size, 1)),
        }


def _make_embed_provider(args, cross_dim, pooled_dim):
    """Choose the prompt-embedding source (stem-keyed precomputed dir, live
    text towers, or zeros). Caption dropout reaches the UNet in every mode:
    a dropped caption ("") maps to the null-prompt embedding."""
    from .text_embeds import PromptEmbedProvider

    if args.embeds_dir:
        return PromptEmbedProvider.from_dir(args.embeds_dir)
    if args.text_encoder_dir and args.tokenizer_dir:
        import jax as _jax
        import jax.numpy as _jnp

        from ..models.clip_text import SDXLTextEncoder
        from ..models.tokenizer import SDXLTokenizer
        from .checkpoint import load_params

        tok = SDXLTokenizer(
            os.path.join(args.tokenizer_dir, "tokenizer"),
            os.path.join(args.tokenizer_dir, "tokenizer_2"))
        enc = SDXLTextEncoder(dtype=_jnp.bfloat16)
        params = {"params": load_params(args.text_encoder_dir)}
        apply = _jax.jit(enc.apply)

        def encode(ids_1, ids_2):
            return apply(params, _jnp.asarray(ids_1), _jnp.asarray(ids_2))

        return PromptEmbedProvider.from_towers(tok, encode)
    return PromptEmbedProvider.zeros(cross_dim, pooled_dim)


def _dataset_batches(args, cross_dim, pooled_dim,
                     provider=None) -> Iterator[dict]:
    from ..data.dataset import LocalPairedDataset, collate, discover_pairs

    hr, lr, caps = discover_pairs(args.hr_dir, args.lr_dir, args.caption_dir)
    ds = LocalPairedDataset(hr, lr, caps, resolution=args.resolution,
                            seed=args.seed)
    stems = [os.path.splitext(os.path.basename(p))[0] for p in hr]
    provider = provider or _make_embed_provider(args, cross_dim, pooled_dim)

    workers = getattr(args, "dataloader_workers", 0)
    if workers > 0:
        # parallel decode+augment with per-draw deterministic rng
        from ..data.prefetch import ParallelSampleLoader

        class _WithStem:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i, rng=None):
                return ds.__getitem__(i, rng=rng), stems[i]

        def _collate(pairs):
            batch = collate([p[0] for p in pairs])
            captions = batch.pop("captions")
            batch["prompt_embeds"], batch["pooled_embeds"] = provider.batch(
                [p[1] for p in pairs], captions)
            return batch

        yield from ParallelSampleLoader(
            _WithStem(), args.train_batch_size, _collate, seed=args.seed,
            num_workers=workers,
            depth=max(1, getattr(args, "prefetch_depth", 2)))
        return

    rng = np.random.default_rng(args.seed)
    n = len(ds)
    while True:
        idx = rng.integers(0, n, args.train_batch_size)
        samples = [ds[int(i)] for i in idx]
        batch = collate(samples)
        captions = batch.pop("captions")
        batch["prompt_embeds"], batch["pooled_embeds"] = provider.batch(
            [stems[int(i)] for i in idx], captions)
        yield batch


def resolve_stage_defaults(args) -> None:
    """Stage-dependent recipe defaults (in place). Stage 1 mirrors the
    reference launch (`train_stage_1.sh`: batch 16/dev, accum 4). Stage 2
    applies the MEASURED v5e-8 memory-fit plan (PERFORMANCE.md stage-2
    table): remat on, batch 2/dev x accum 16 — the only configuration the
    real v5e compiler PASSED (batch 4 measured over capacity: 16.68 GiB
    alias-free / 20.83 donated vs 15.75 available). Effective batch stays
    256, the reference's 16 x 4 proc x 4 accum."""
    if args.train_batch_size is None:
        args.train_batch_size = 2 if args.stage == 2 else 16
    if args.grad_accum is None:
        args.grad_accum = 16 if args.stage == 2 else 4
    if args.remat is None:
        args.remat = 1 if args.stage == 2 else 0


def main(argv=None, *, unet_config: Optional[UNetConfig] = None,
         vae_config: Optional[VAEConfig] = None,
         denoise_encoder_config: Optional[DenoiseEncoderConfig] = None):
    import dataclasses

    args = parse_args(argv)
    resolve_stage_defaults(args)
    ucfg = unet_config or UNetConfig()
    vcfg = vae_config or VAEConfig()
    dcfg = denoise_encoder_config or DenoiseEncoderConfig()
    if args.remat:
        ucfg = dataclasses.replace(ucfg, remat=True)
        dcfg = dataclasses.replace(dcfg, remat=True)
    cfg = TrainConfig(
        resolution=args.resolution,
        batch_size_per_device=args.train_batch_size,
        grad_accum=args.grad_accum,
        learning_rate=args.learning_rate,
        vis_learning_rate=args.vis_learning_rate,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps,
        noise_offset=args.noise_offset,
        max_grad_norm=args.max_grad_norm,
        ema_update_interval=args.ema_update_interval,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        validation_steps=args.validation_steps,
        stage=args.stage,
        seed=args.seed,
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    unet = UNet2DConditionModel(config=ucfg, dtype=dtype)
    de = DenoiseEncoder(config=dcfg, dtype=dtype)
    vae = AutoencoderKL(config=vcfg, dtype=dtype)

    pooled_dim = ucfg.projection_class_embeddings_input_dim - \
        ucfg.addition_time_embed_dim * 6
    res = args.resolution
    rng = jax.random.PRNGKey(args.seed)

    if args.pretrained_params_dir:
        unet_params = {"params": load_params(
            os.path.join(args.pretrained_params_dir, "unet"))}
        de_params = {"params": load_params(
            os.path.join(args.pretrained_params_dir, "denoise_encoder"))}
        vae_params = {"params": load_params(
            os.path.join(args.pretrained_params_dir, "vae"))}
    else:
        r1, r2, r3 = jax.random.split(rng, 3)
        lat = res // 8
        unet_params = unet.init(
            r1, jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 77, ucfg.cross_attention_dim)),
            jnp.zeros((1, pooled_dim)), jnp.zeros((1, 6)),
            jnp.zeros((1, lat, lat, ucfg.condition_channels)))
        de_params = de.init(r2, jnp.zeros((1, res, res, 3)))
        vae_params = vae.init(r3, jnp.zeros((1, res, res, 3)))

    state, tx = init_train_state(cfg, unet_params, de_params)

    def vae_encode(p, img, key):
        m = vae.apply(p, img, method=AutoencoderKL.encode_moments)
        return sample_from_moments(m, key).astype(jnp.float32) * \
            vcfg.scaling_factor

    def unet_apply(p, *a):
        return unet.apply(p, *a[:6], add_sample=a[6], fusion_group_size=a[7])

    # donate the state: params/EMA/Adam trees update in place instead of
    # double-buffering across the step (~5 GiB saved at stage-2 scale)
    step_fn = jax.jit(make_train_step(
        unet_apply, lambda p, x: de.apply(p, x), vae_encode, vae_params,
        tx, cfg, SchedulerConfig()), donate_argnums=(0,))

    # mesh: batch over data axis, ZeRO-sharded optimizer state. Stage 2
    # uses the measured memory-fit plan (variant C of the v5e-8 AOT
    # analysis, PERFORMANCE.md): params and EMA ZeRO-sharded too — the
    # replicated fp32 trees alone (10.4 GB params + 10.4 GB EMA) overflow
    # a 16 GiB chip when everything is trainable. Stage 1 keeps params
    # replicated (plan A): its trainable set is the small adapter stack.
    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    state = state._replace(
        params=(jax.tree.map(jax.device_put, state.params,
                             shard_leading_divisible(state.params, mesh))
                if args.stage == 2 else
                jax.tree.map(lambda x: jax.device_put(x, rep),
                             state.params)),
        opt_state=jax.tree.map(
            jax.device_put, state.opt_state,
            shard_leading_divisible(state.opt_state, mesh)),
        ema=(jax.tree.map(jax.device_put, state.ema,
                          shard_leading_divisible(state.ema, mesh))
             if args.stage == 2 else state.ema),
    )

    ckpt = CheckpointManager(
        args.output_dir, max_to_keep=args.checkpoints_total_limit,
        save_interval_steps=args.checkpointing_steps)
    start_step = 0
    if args.resume_from_checkpoint:
        state = ckpt.restore(state)
        start_step = int(state.step)
        print(f"resumed from step {start_step}")

    if args.synthetic_data or not args.hr_dir:
        batches = _synthetic_batches(
            args.train_batch_size, res, ucfg.cross_attention_dim, pooled_dim,
            args.seed)
    else:
        batches = _dataset_batches(args, ucfg.cross_attention_dim, pooled_dim)
    if getattr(args, "prefetch_depth", 0) > 0:
        # overlap host-side batch production with the device step
        from ..data.prefetch import PrefetchIterator

        batches = PrefetchIterator(iter(batches), depth=args.prefetch_depth)

    from .logging import MetricLogger

    logger = MetricLogger(os.path.join(args.output_dir, "logs"))
    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for step_idx in range(start_step, args.max_train_steps):
        batch = next(batches)
        batch = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), bsh), batch)
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        if (step_idx + 1) % args.log_every == 0:
            loss = float(metrics["loss"])
            rate = args.log_every / (time.time() - t0)
            t0 = time.time()
            logger.log(step_idx + 1, {"train_loss": loss,
                                      "grad_norm": float(metrics["grad_norm"]),
                                      "it_per_s": rate})
            print(f"step {step_idx + 1} loss {loss:.4f} "
                  f"({rate:.2f} it/s)", flush=True)
        if args.val_dir and (step_idx + 1) % args.validation_steps == 0:
            _run_validation(args, ucfg, vcfg, dcfg, state, vae_params,
                            step_idx + 1)
        ckpt.save(step_idx + 1, state)
    ckpt.save(args.max_train_steps, state, force=True)
    ckpt.wait()
    logger.close()
    print("training done")
    return state


def _run_validation(args, ucfg, vcfg, dcfg, state, vae_params, step):
    """Restore a few validation images with current EMA params and save a
    strip image (mirrors `train_SDXL_stage_1.py:127-195`; stage-2 MUSIQ
    scoring plugs in via eval.metrics when pyiqa weights are present)."""
    import glob as _glob

    from PIL import Image

    from ..pipelines.factory import build_pipeline
    from ..config import PipelineConfig
    from .ema import ema_copy_to

    ema_params = ema_copy_to(state.ema, state.params)
    pipe = build_pipeline(
        unet_config=ucfg, vae_config=vcfg, denoise_encoder_config=dcfg,
        pipeline_config=PipelineConfig(num_inference_steps=20,
                                       tile_size=args.resolution),
        unet_params={"params": ema_params["unet"]},
        vae_params=vae_params,
        denoise_encoder_params={"params": ema_params["denoise_encoder"]},
        dtype=jnp.bfloat16,
    )
    paths = sorted(_glob.glob(os.path.join(args.val_dir, "*")))[
        : args.val_num_images]
    outs = []
    pooled_dim = ucfg.projection_class_embeddings_input_dim - \
        ucfg.addition_time_embed_dim * 6
    pe = jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.float32)
    pooled = jnp.zeros((1, pooled_dim), jnp.float32)
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB").resize(
            (args.resolution, args.resolution)), np.float32) / 255.0
        out = pipe(img, pe, pooled, seed=42)
        outs.append(np.uint8(np.clip(out, 0, 1) * 255))
    if outs:
        strip = np.concatenate(outs, axis=1)
        out_dir = os.path.join(args.output_dir, "validation")
        os.makedirs(out_dir, exist_ok=True)
        # MUSIQ quality signal, baked into the strip filename (the stage-2
        # protocol, `train_SDXL_stage_2.py:182-194`): native eval/musiq.py
        # when converted weights exist, pyiqa passthrough otherwise
        name = f"step_{step}.png"
        try:
            from ..eval.metrics import make_learned_metrics
            from ..eval.musiq import make_musiq

            musiq_fn = make_musiq()
            if musiq_fn is None:
                musiq_fn = make_learned_metrics(("musiq",)).get("musiq")
            if musiq_fn is not None:
                scores = [musiq_fn(o.astype(np.float32) / 255.0)
                          for o in outs]
                mean = float(np.mean(scores))
                print(f"validation MUSIQ @ step {step}: {mean:.3f}")
                name = f"step_{step}_musiq{mean:.3f}.png"
        except Exception:
            pass
        Image.fromarray(strip).save(os.path.join(out_dir, name))
