"""Stage-2 v5e-8 memory-fit analysis by AOT compilation against the REAL
TPU v5e 2x4 topology (no hardware needed).

Round-2 weak #8: PERFORMANCE.md asserted stage-2 "cannot fit one chip by
construction" and that the ZeRO mesh fits v5e-8 — without evidence. This
script lowers the FULL-SDXL stage-2 train step (batch 16/device, 512 res —
the reference recipe, `/root/reference/train_stage_2.sh:1`,
`/root/reference/dataloader/accelerate_config.yaml:4,9`) with fully
abstract inputs against `jax.experimental.topologies` v5e:2x4, compiles it
with the real TPU compiler, and records `memory_analysis()` per-device HBM
for several sharding plans:

  A. round-2 dryrun plan: params+EMA replicated, Adam moments ZeRO-sharded
  B. + EMA sharded over data (ZeRO-2 on every elementwise state)
  C. + params sharded over data too (ZeRO-3-style; XLA all-gathers weights)

Usage:  python scripts/stage2_memory_analysis.py [--variant A|B|C] [--batch N]
Writes JSON lines to stdout; each line is one variant's per-device bytes.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

# repo root on sys.path WITHOUT using PYTHONPATH (a PYTHONPATH entry breaks
# the axon TPU plugin's backend discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# host side runs on CPU: the axon device plugin registers lazily and clashes
# with topology-only AOT init; the TARGET is still the real v5e compiler via
# `topologies.get_topology_desc` + local libtpu. NOTE libtpu's
# /tmp/libtpu_lockfile makes this mutually exclusive with the axon device
# plugin — run only while the chip is idle.
jax.config.update("jax_platforms", "cpu")
# persist the (>75 CPU-min at batch 16) stage-2 compile across attempts
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from faithdiff_tpu.config import (DenoiseEncoderConfig, SchedulerConfig,
                                  TrainConfig, UNetConfig, VAEConfig)
from faithdiff_tpu.models.unet import UNet2DConditionModel
from faithdiff_tpu.models.vae import (AutoencoderKL, DenoiseEncoder,
                                      sample_from_moments)
from faithdiff_tpu.training.train import init_train_state, make_train_step

HBM_PER_CHIP = 16 * 1024 ** 3   # v5e: 16 GiB


def _abstract(tree, sharding_fn):
    return jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype,
                                       sharding=sharding_fn(l)), tree)


def shard_rule_leading(mesh, n):
    def rule(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] % n == 0 and leaf.shape[0] >= n:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())
    return rule


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="A", choices=["A", "B", "C"])
    ap.add_argument("--batch", type=int, default=16,
                    help="per-device batch (reference recipe: 16)")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--effort", type=float, default=None,
                    help="xla exec_time_optimization_effort override "
                    "(e.g. -1.0 = minimum scheduling effort). Cuts the "
                    ">75-CPU-min compile several-fold; memory fitting "
                    "still runs at default effort, but buffer "
                    "assignment can differ from a full-effort compile — "
                    "the value is recorded in the output record.")
    ap.add_argument("--remat", action="store_true",
                    help="gradient-checkpoint the UNet blocks AND the "
                    "denoise_encoder (the reference's grad-ckpt paths, "
                    "`unet_2d_condition_vae_extension.py:125-143`). "
                    "Measured round 5: WITHOUT this, variant A at the "
                    "reference recipe needs 109.4 GiB/chip (denoise_encoder "
                    "activations) and the compiler aborts.")
    ap.add_argument("--no-donate", action="store_true",
                    help="lower WITHOUT donating the train state. At minimum "
                    "scheduling effort, donation's aliasing constraints are "
                    "not re-scheduled around and the reported peak RISES "
                    "(measured round 5: 16.68 -> 20.83 GiB at batch 4); the "
                    "alias-free lowering instead reports temps + args + "
                    "outputs separately, from which the production donated "
                    "peak is bounded by max(args, outputs) + temps.")
    args = ap.parse_args()

    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    devices = np.asarray(topo.devices)
    mesh = Mesh(devices.reshape(-1), ("data",))
    n = devices.size

    ucfg = UNetConfig(remat=args.remat)
    dcfg = DenoiseEncoderConfig(remat=args.remat)
    vcfg = VAEConfig()
    dtype = jnp.bfloat16       # compute dtype (runner default)
    unet = UNet2DConditionModel(config=ucfg, dtype=dtype)
    de = DenoiseEncoder(config=dcfg, dtype=dtype)
    vae = AutoencoderKL(config=vcfg, dtype=dtype)

    res = args.resolution
    ldim = res // 8
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - ucfg.addition_time_embed_dim * 6)

    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    unet_shapes = jax.eval_shape(
        unet.init, rng,
        jax.ShapeDtypeStruct((1, ldim, ldim, ucfg.in_channels), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.float32),
        jax.ShapeDtypeStruct((1, 77, ucfg.cross_attention_dim), jnp.float32),
        jax.ShapeDtypeStruct((1, pooled_dim), jnp.float32),
        jax.ShapeDtypeStruct((1, 6), jnp.float32),
        jax.ShapeDtypeStruct((1, ldim, ldim, ucfg.condition_channels),
                             jnp.float32))
    de_shapes = jax.eval_shape(
        de.init, rng, jax.ShapeDtypeStruct((1, res, res, 3), jnp.float32))
    vae_shapes = jax.eval_shape(
        vae.init, rng, jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))

    cfg = TrainConfig(stage=2, batch_size_per_device=args.batch,
                      resolution=res)
    state_shapes = jax.eval_shape(
        lambda up, dp: init_train_state(cfg, up, dp)[0],
        unet_shapes, de_shapes)
    # tx built directly on the shape tree (labels depend only on tree
    # structure; init_train_state itself would eagerly call tx.init/ema_init
    # on ShapeDtypeStruct leaves)
    from faithdiff_tpu.training.train import make_optimizer

    tx = make_optimizer(cfg, {"unet": unet_shapes["params"],
                              "denoise_encoder": de_shapes["params"]})

    def vae_encode(p, img, key):
        m = vae.apply(p, img, method=AutoencoderKL.encode_moments)
        return sample_from_moments(m, key).astype(jnp.float32) * \
            vcfg.scaling_factor

    def unet_apply(p, *a):
        return unet.apply(p, *a[:6], add_sample=a[6], fusion_group_size=a[7])

    step = make_train_step(unet_apply, lambda p, x: de.apply(p, x),
                           vae_encode, None, tx, cfg, SchedulerConfig())

    rep = lambda _l: NamedSharding(mesh, P())           # noqa: E731
    zero = shard_rule_leading(mesh, n)
    v = args.variant
    params_rule = zero if v == "C" else rep
    ema_rule = zero if v in ("B", "C") else rep

    state_abs = type(state_shapes)(
        step=jax.ShapeDtypeStruct((), jnp.int32,
                                  sharding=NamedSharding(mesh, P())),
        params=_abstract(state_shapes.params, params_rule),
        opt_state=_abstract(state_shapes.opt_state, zero),
        ema=_abstract(state_shapes.ema, ema_rule),
    )
    b = args.batch * n
    bsh = lambda _l: NamedSharding(mesh, P("data"))     # noqa: E731
    batch_abs = _abstract({
        "hr": jax.ShapeDtypeStruct((b, res, res, 3), jnp.float32),
        "lq": jax.ShapeDtypeStruct((b, res, res, 3), jnp.float32),
        "prompt_embeds": jax.ShapeDtypeStruct(
            (b, 77, ucfg.cross_attention_dim), jnp.float32),
        "pooled_embeds": jax.ShapeDtypeStruct((b, pooled_dim), jnp.float32),
        "add_time_ids": jax.ShapeDtypeStruct((b, 6), jnp.float32),
    }, bsh)
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                   sharding=NamedSharding(mesh, P()))
    vae_abs = _abstract(vae_shapes, rep)

    print(f"[stage2-mem] lowering variant {v}: batch {args.batch}/dev x {n} "
          f"dev, res {res}", file=sys.stderr)
    # donate the state, as the training runner does: without aliasing, the
    # fp32 params/EMA/Adam trees are double-buffered across the step
    # (input + output live simultaneously — ~5 GiB at variant C). The
    # --no-donate lowering is the alias-free diagnostic (see its help).
    donate = () if args.no_donate else (0,)
    lowered = jax.jit(step, donate_argnums=donate).lower(
        state_abs, batch_abs, key_abs, vae_abs)
    print("[stage2-mem] compiling (real TPU compiler, v5e:2x4)...",
          file=sys.stderr)
    copts = ({} if args.effort is None
             else {"exec_time_optimization_effort": args.effort})
    import re
    import time as _time
    _t0 = _time.perf_counter()
    try:
        compiled = lowered.compile(compiler_options=copts or None)
    except Exception as e:  # RESOURCE_EXHAUSTED is itself the measurement
        msg = str(e)
        if "RESOURCE_EXHAUSTED" not in msg:
            raise
        # keep the compiler's largest-buffer table for diagnosis
        print(msg[:8000], file=sys.stderr)
        m = re.search(r"Used ([\d.]+)G of ([\d.]+)G hbm", msg)
        print(json.dumps({
            "variant": v,
            "remat": args.remat,
            "donate": not args.no_donate,
            "exec_time_optimization_effort": args.effort,
            "compile_s": round(_time.perf_counter() - _t0, 1),
            "per_device_batch": args.batch,
            "resolution": res,
            "fits": False,
            "used_gib": float(m.group(1)) if m else None,
            "hbm_per_chip_gib": float(m.group(2)) if m else 16.0,
            "error": msg.splitlines()[0][:300],
        }))
        return
    compile_s = _time.perf_counter() - _t0
    ma = compiled.memory_analysis()
    out = {
        "variant": v,
        "remat": args.remat,
        "donate": not args.no_donate,
        "exec_time_optimization_effort": args.effort,
        "compile_s": round(compile_s, 1),
        "per_device_batch": args.batch,
        "resolution": res,
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "alias_bytes": int(ma.alias_size_in_bytes),
        "generated_code_bytes": int(ma.generated_code_size_in_bytes),
        # peak live = args + temps (outputs alias args via donation in real
        # training; here un-donated, so report both readings)
        "peak_no_donation_gib": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / 1024**3, 2),
        "peak_donated_gib": round(
            (max(ma.argument_size_in_bytes, ma.output_size_in_bytes)
             + ma.temp_size_in_bytes) / 1024**3, 2),
        "hbm_per_chip_gib": 16.0,
        "fits": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
