"""The FaithDiff tiled (TLC) restoration pipeline.

Capability-equivalent to
`/root/reference/FaithDiff/pipelines/pipeline_FaithDiff_tlc.py` (class
`FaithDiffStableDiffusionXLPipeline.__call__`, :1008-1459), redesigned
TPU-first:

- the reference's sequential Python loop over tiles (`:1330`) becomes a
  single batched UNet call with tiles stacked on the batch axis — the CFG
  pair of each tile kept adjacent so the fusion transformer's
  cross-batch attention sees exactly the reference's per-tile [uncond, cond]
  sequence (see `models/adapters.py`)
- the denoise loop (`:1323`) is a `jax.lax.scan` over timesteps, fully
  on-device: split -> UNet -> CFG -> scheduler step -> Gaussian blend-merge
  -> re-split per step, all traced once
- per-tile scheduler state (`views_scheduler_status`, `:1282`) is pure: the
  Euler/DDIM family used here is deterministic per step, so a shared state
  array + the step index reproduces the deep-copied per-tile dicts exactly
- tiles shard across chips over ICI by putting a `NamedSharding` on the tile
  batch axis (the reference runs tiles sequentially on one GPU)

Latent layout NHWC; [B=1, H/8, W/8, 4].
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig, SchedulerConfig
from ..schedulers import DDPMScheduler, EulerDiscreteScheduler
from ..utils.color_fix import adain_color_fix, wavelet_color_fix
from ..utils.image import (denormalize_from_diffusion,
                           normalize_to_diffusion)
from .tiling import (TileLayout, compute_tile_layout, gaussian_tile_weights,
                     merge_tiles, split_tiles, tile_position_ids)


def torch_randn_latents_nhwc(seed: int, lh: int, lw: int,
                             channels: int = 4) -> jax.Array:
    """Initial latents with bit-parity to the reference/diffusers
    `randn_tensor` (`pipeline_FaithDiff_tlc.py:819-835`): torch.Generator
    CPU noise drawn in NCHW order, rearranged to NHWC — identical values at
    every (c, y, x) position."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    t_noise = torch.randn((1, channels, lh, lw), generator=gen)
    return jnp.asarray(t_noise.permute(0, 2, 3, 1).numpy(), jnp.float32)


def _canvas_ckpt_load(ckpt_dir: str, meta: dict):
    """Resume point for a crashed host-driven run: returns
    `(next_step, latents)` from the newest per-step canvas checkpoint whose
    run metadata matches, else None. Written by `_canvas_ckpt_save`."""
    import json

    meta_path = os.path.join(ckpt_dir, "canvas_meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        if json.load(f) != meta:
            return None                  # different run configuration
    best = None
    for name in os.listdir(ckpt_dir):
        if name.startswith("canvas_step") and name.endswith(".npy"):
            step = int(name[len("canvas_step"):-len(".npy")])
            if best is None or step > best:
                best = step
    if best is None:
        return None
    # best == steps-1 resumes DIRECTLY into decode: a crash after the last
    # denoise step but before decode must not re-denoise (~380-930 s at 8K)
    lat = np.load(os.path.join(ckpt_dir, f"canvas_step{best:04d}.npy"))
    return best + 1, lat


def _canvas_ckpt_save(ckpt_dir: str, meta: dict, step: int,
                      latents: np.ndarray) -> None:
    """Atomically persist the post-step canvas + run metadata. ~16 MB at
    8K-class latents — negligible next to a 20-45 s denoise step, and it
    turns a \"TPU worker crashed\" kernel fault mid-8K-run into a resume
    instead of a restart."""
    import json

    os.makedirs(ckpt_dir, exist_ok=True)
    meta_path = os.path.join(ckpt_dir, "canvas_meta.json")
    stale = True
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stale = json.load(f) != meta
    if stale:
        # new run configuration: drop checkpoints from the previous run so
        # they can never be resumed against the wrong metadata
        for name in os.listdir(ckpt_dir):
            if name.startswith("canvas_step") and name.endswith(".npy"):
                os.remove(os.path.join(ckpt_dir, name))
        with open(meta_path + ".tmp", "w") as f:
            json.dump(meta, f)
        os.replace(meta_path + ".tmp", meta_path)
    path = os.path.join(ckpt_dir, f"canvas_step{step:04d}.npy")
    np.save(path + ".tmp.npy", latents)
    os.replace(path + ".tmp.npy", path)


def _content_hash(*arrays) -> str:
    """Hash of array contents for canvas-resume metadata: a resume must
    only match a run with identical conditioning (prompt embeds change per
    caption) and identical initial latents — not just identical flags."""
    import hashlib

    h = hashlib.sha256()
    for a in arrays:
        if a is None:
            h.update(b"none")
            continue
        x = np.asarray(a)
        h.update(str((tuple(x.shape), str(x.dtype))).encode())
        h.update(np.ascontiguousarray(x).tobytes())
    return h.hexdigest()[:16]


def _params_fingerprint(params) -> str:
    """Cheap weight-identity fingerprint: full tree structure/shapes/dtypes
    plus the bytes of the smallest leaf (a zero-init projection bias flips
    the moment a different checkpoint is loaded). Avoids hashing the full
    ~5 GB parameter tree per run."""
    import hashlib

    leaves = jax.tree.leaves(params)
    h = hashlib.sha256()
    h.update(str([(tuple(l.shape), str(l.dtype))
                  for l in leaves]).encode())
    if leaves:
        small = min(leaves, key=lambda l: l.size)
        h.update(np.ascontiguousarray(np.asarray(small)).tobytes())
    return h.hexdigest()[:16]


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale):
    """CFG rescale (`pipeline_FaithDiff_tlc.py:286-305`)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg


@dataclasses.dataclass
class FaithDiffPipeline:
    """Orchestrates denoise_encoder -> tiled UNet denoising -> VAE decode.

    Model `apply` callables are injected so the pipeline stays framework-thin:
      unet_apply(params, sample, t, context, pooled, time_ids, cond,
                 fusion_group_size) -> eps
      denoise_encoder_apply(params, image) -> LQ features [B, H/8, W/8, 512]
      vae_encode(params, image, key) -> scaled latents
      vae_decode(params, latents) -> image in [-1, 1]
    """

    unet_apply: Callable
    denoise_encoder_apply: Callable
    vae_encode: Callable
    vae_decode: Callable
    unet_params: Any
    denoise_encoder_params: Any
    vae_params: Any
    scheduler: EulerDiscreteScheduler = dataclasses.field(
        default_factory=EulerDiscreteScheduler)
    ddpm_scheduler: DDPMScheduler = dataclasses.field(
        default_factory=DDPMScheduler)
    config: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)
    vae_scaling_factor: float = 0.13025
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None
    # shard the tile batch axis over a mesh: tiles are padded up to a
    # multiple of `tile_devices` (padded tiles are masked out of the merge)
    tile_sharding: Optional[jax.sharding.NamedSharding] = None
    tile_devices: int = 1
    # cap on tiles per UNet call (memory bound for 8K-class inputs); must be
    # a multiple of tile_devices when both are set
    tile_chunk: Optional[int] = None
    # above this tile count, drive the denoise loop one step per device
    # dispatch (long single dispatches get killed by the device tunnel)
    host_loop_tile_threshold: int = 16
    # fp8 mode: dequantize-to-compute-dtype hook. In the CHUNKED path the
    # per-chunk whole-tree upcast inside `lax.map` re-executed every chunk
    # (round-2: fp8 8K was 30% SLOWER than bf16); this hook hoists the
    # upcast to once per jitted call, outside the chunk loop. The
    # non-chunked path keeps the per-consumer convert fusion (12% faster
    # at 1024^2) by NOT hoisting.
    unet_params_prepare: Optional[Callable] = None
    # split each denoise STEP into multiple device dispatches when the
    # per-step chunk-loop iteration count exceeds this cap: the device
    # tunnel kills dispatches longer than ~60 s, which makes extreme tile
    # counts (8K at overlap 0.25 = 841 tiles = 211 chunk-iterations)
    # un-runnable as one dispatch. None = never split.
    max_chunks_per_dispatch: Optional[int] = None

    # ------------------------------------------------------------------
    # jitted core
    # ------------------------------------------------------------------

    def __post_init__(self):
        # bound method closure over self; recompiles only per static args
        self._jit_denoise = jax.jit(
            self._denoise_loop,
            static_argnames=("layout", "num_steps", "guidance_scale",
                            "guidance_rescale", "add_sample", "pad_tiles",
                            "tile_chunk", "lazy_tiles"),
        )
        # decode + denormalize + color fix fused into one jit (separate
        # dispatches each pay the device-tunnel round-trip latency). The
        # tiled-VAE path must NOT be fused: inlining every tile decode into
        # one program makes XLA keep too many tile buffers live (OOM at 4K+)
        # — there the decode runs tile-by-tile outside the fusion.
        self._jit_postprocess = jax.jit(
            self._postprocess, static_argnames=("color_fix", "to_uint8"))
        self._jit_denorm = jax.jit(self._denormalize_latents)
        # input prep on device: a uint8 upload is 4x smaller than fp32
        # (201 MB vs 804 MB at 8K through the tunnel); the [0,1]->[-1,1]
        # normalize runs fused on device instead of as an eager op
        self._jit_prep = jax.jit(self._prep_input)
        # split-dispatch denoise (extreme tile counts): one scheduler step
        # over one tile sub-range per dispatch + a separate merge dispatch
        self._jit_denoise_part = jax.jit(
            self._denoise_part,
            static_argnames=("layout", "num_steps", "guidance_scale",
                             "guidance_rescale", "add_sample", "tile_chunk"),
        )
        self._jit_merge = jax.jit(
            lambda tiles, layout: merge_tiles(
                tiles, layout,
                jnp.asarray(gaussian_tile_weights(*layout.kernel))),
            static_argnames=("layout",))

    def _prep_input(self, x):
        """[1, H, W, 3] uint8 or float [0,1] -> fp32 in [-1, 1]."""
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        return normalize_to_diffusion(x.astype(jnp.float32))

    def _denormalize_latents(self, latents):
        if self.latents_mean is not None and self.latents_std is not None:
            mean = jnp.asarray(self.latents_mean).reshape(1, 1, 1, 4)
            std = jnp.asarray(self.latents_std).reshape(1, 1, 1, 4)
            return latents * std / self.vae_scaling_factor + mean
        return latents / self.vae_scaling_factor

    def _finish(self, image_out, src, color_fix: str,
                to_uint8: bool = False):
        # keep the color transfer in the decode dtype (bf16 on TPU): fp32
        # doubles ~10 full-resolution buffers and OOMs at 4K+
        image_out = denormalize_from_diffusion(image_out)
        if src.dtype == jnp.uint8:
            src = src.astype(jnp.float32) / 255.0
        src = src.astype(image_out.dtype)
        if color_fix == "wavelet":
            image_out = wavelet_color_fix(image_out, src)
        elif color_fix == "adain":
            image_out = adain_color_fix(image_out, src)
        if to_uint8:
            # quantize on device: the host readback shrinks 4x (at 8K-class
            # outputs the fp32 canvas is ~800 MB through the tunnel)
            return jnp.round(
                jnp.clip(image_out, 0.0, 1.0).astype(jnp.float32) * 255.0
            ).astype(jnp.uint8)
        return image_out.astype(jnp.float32)

    def _postprocess(self, vae_params, latents, src, color_fix: str,
                     to_uint8: bool = False):
        latents = self._denormalize_latents(latents)
        image_out = self.vae_decode(vae_params, latents)
        return self._finish(image_out, src, color_fix, to_uint8)

    def _denoise_loop(
        self,
        unet_params,
        latents: jax.Array,            # [1, h, w, 4] initial noisy latents
        image_latent_tiles: jax.Array,  # [T, k1, k2, C] LQ feature tiles
        prompt_embeds: jax.Array,      # [2, 77*, 2048] (neg, pos)
        pooled_embeds: jax.Array,      # [2, 1280]
        base_time_ids: jax.Array,      # [T, 6] per-tile micro-conditioning
        layout: TileLayout,
        num_steps: int,
        guidance_scale: float,
        guidance_rescale: float,
        add_sample: bool,
        pad_tiles: int,
        tile_chunk: Optional[int] = None,
        step_indices: Optional[jax.Array] = None,
        lazy_tiles: bool = False,
        tile_offsets: Optional[jax.Array] = None,  # [Tp, 2] when lazy
    ) -> jax.Array:
        """`step_indices` (dynamic values, static length) selects which
        scheduler steps to run; None -> all `num_steps` in one scan. Large
        tile counts are driven per-step from the host so a single device
        dispatch stays short (the device tunnel kills long dispatches).

        `lazy_tiles`: `image_latent_tiles` is the UNSPLIT [1, H, W, C]
        feature map; each chunk's LQ tiles are dynamic-sliced on the fly
        using `tile_offsets`. Materialising all T tiles up front is ~4x
        the feature map (overlap 0.5) — several GB at 8K-class inputs.

        Under tile sharding the feature map stays REPLICATED across the mesh
        and the per-chunk slices are sharding-constrained onto the tile axis:
        each device gathers its own tiles from its local copy, so the lazy
        path composes with tile parallelism with no extra collectives (the
        round-2 mutual exclusion was the 8K multi-chip blocker)."""
        sched = self.scheduler

        def shard_tiles(x):
            # GSPMD hint: batch/tile axis over the mesh. In lazy mode there
            # is no sharded big input to propagate from, so the constraint
            # is what makes the UNet run tile-parallel.
            if self.tile_sharding is None:
                return x
            return jax.lax.with_sharding_constraint(x, self.tile_sharding)
        state = sched.set_timesteps(num_steps)
        t_count = layout.num_tiles
        t_pad = t_count + pad_tiles
        weights = jnp.asarray(gaussian_tile_weights(*layout.kernel))

        pad_idx = np.arange(pad_tiles) % t_count

        def pad(tiles):
            if pad_tiles == 0:
                return tiles
            return jnp.concatenate([tiles, tiles[pad_idx]], axis=0)

        chunk = t_pad if tile_chunk is None else min(tile_chunk, t_pad)

        # fp8 hoist (chunked path only): one whole-tree upcast per jitted
        # call instead of one per lax.map iteration
        hoist_dequant = self.unet_params_prepare is not None and chunk < t_pad
        if hoist_dequant:
            unet_params = self.unet_params_prepare(unet_params)
        unet_kw = {"skip_dequant": True} if hoist_dequant else {}

        # per-UNet-call constants (CFG pair per tile, built at chunk size so
        # the duplicated image-latent tiles never materialise for ALL tiles
        # at once — at 8K-class tile counts that duplication alone is GBs)
        ctx_c = jnp.tile(prompt_embeds, (chunk, 1, 1))
        pooled_c = jnp.tile(pooled_embeds, (chunk, 1))

        k1, k2 = layout.kernel

        def slice_lq(offsets_c):
            """Chunk's LQ tiles from the unsplit feature map (lazy mode)."""
            c = image_latent_tiles.shape[-1]

            def one(off):
                return jax.lax.dynamic_slice(
                    image_latent_tiles, (0, off[0], off[1], 0),
                    (1, k1, k2, c))[0]

            return jax.vmap(one)(offsets_c)

        def run_unet(tiles_c, i, t, time_ids_c, img_c):
            """One UNet call over a chunk of tiles: duplicate to CFG pairs
            here ([neg_0, pos_0, neg_1, pos_1, ...] tile-major)."""
            model_in = jnp.repeat(tiles_c, 2, axis=0)
            model_in = sched.scale_model_input(state, model_in, i)
            eps = self.unet_apply(
                unet_params, model_in, t, ctx_c, pooled_c,
                jnp.repeat(time_ids_c, 2, axis=0),
                jnp.repeat(img_c, 2, axis=0),
                add_sample, 2, **unet_kw)
            return eps

        def step_fn(latents, i):
            tiles = pad(split_tiles(latents, layout))          # [Tp, k, k, 4]
            t = state.timesteps[i]
            if chunk < t_pad:
                # bound UNet working-set: lax.map over tile chunks — the
                # 8K-class path where hundreds of tiles cannot run as one
                # batch (the reference runs them one-by-one, `:1330`)
                n_chunks = t_pad // chunk

                def per_chunk(args):
                    tl, ti, im = args
                    if lazy_tiles:
                        im = shard_tiles(slice_lq(im))
                    return run_unet(shard_tiles(tl), i, t, ti, im)

                def r(x):
                    return x.reshape(n_chunks, chunk, *x.shape[1:])

                lq = tile_offsets if lazy_tiles else image_latent_tiles
                eps = jax.lax.map(
                    per_chunk, (r(tiles), r(base_time_ids), r(lq)))
                eps = eps.reshape(2 * t_pad, *eps.shape[2:])
            else:
                img_all = (shard_tiles(slice_lq(tile_offsets)) if lazy_tiles
                           else image_latent_tiles)
                eps = run_unet(shard_tiles(tiles), i, t, base_time_ids,
                               img_all)
            eps = eps.reshape(t_pad, 2, *eps.shape[1:])
            eps_uncond, eps_text = eps[:, 0], eps[:, 1]
            eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
            if guidance_rescale > 0.0:
                eps = rescale_noise_cfg(eps, eps_text, guidance_rescale)
            tiles = sched.step(state, eps[:t_count], i, tiles[:t_count])
            latents = merge_tiles(tiles, layout, weights)
            return latents, ()

        latents, _ = jax.lax.scan(
            step_fn, latents,
            jnp.arange(num_steps) if step_indices is None else step_indices,
            unroll=1
        )
        return latents

    def _denoise_part(
        self,
        unet_params,
        latents: jax.Array,             # [1, h, w, 4] current canvas
        image_latent_tiles: jax.Array,  # UNSPLIT [1, H, W, C] feature map
        prompt_embeds: jax.Array,       # [2, 77*, 2048]
        pooled_embeds: jax.Array,       # [2, 1280]
        time_ids_part: jax.Array,       # [P, 6] this part's tiles
        offsets_part: jax.Array,        # [P, 2] latent offsets
        step_index: jax.Array,          # dynamic scheduler step
        layout: TileLayout,
        num_steps: int,
        guidance_scale: float,
        guidance_rescale: float,
        add_sample: bool,
        tile_chunk: int,
    ) -> jax.Array:
        """ONE scheduler step over ONE tile sub-range -> stepped tiles
        [P, k, k, 4]. The host runs several of these per step plus a merge
        dispatch (`_jit_merge`) so no single dispatch exceeds the tunnel's
        ~60 s kill at extreme tile counts (8K overlap-0.25 = 841 tiles).
        Lazy-mode only: both the latent canvas and the LQ feature map are
        sliced per chunk via `offsets_part`. Same math as `_denoise_loop`'s
        step_fn — equality-tested in
        `tests/test_pipeline.py::test_pipeline_split_dispatch_matches`.

        Composes with tile sharding: the canvas and feature map are
        replicated over the mesh, each chunk's slices are
        sharding-constrained onto the tile axis (same scheme as
        `_denoise_loop`'s lazy mode), so each device runs its sub-range of
        every chunk with no cross-device gathers."""
        sched = self.scheduler
        state = sched.set_timesteps(num_steps)
        k1, k2 = layout.kernel
        p_count = time_ids_part.shape[0]
        chunk = min(tile_chunk, p_count)
        i = step_index
        t = state.timesteps[i]

        def shard_tiles(x):
            if self.tile_sharding is None:
                return x
            return jax.lax.with_sharding_constraint(x, self.tile_sharding)

        hoist_dequant = self.unet_params_prepare is not None
        if hoist_dequant:
            unet_params = self.unet_params_prepare(unet_params)
        unet_kw = {"skip_dequant": True} if hoist_dequant else {}

        ctx_c = jnp.tile(prompt_embeds, (chunk, 1, 1))
        pooled_c = jnp.tile(pooled_embeds, (chunk, 1))

        def slice_canvas(canvas, offs):
            c = canvas.shape[-1]

            def one(off):
                return jax.lax.dynamic_slice(
                    canvas, (0, off[0], off[1], 0), (1, k1, k2, c))[0]

            return jax.vmap(one)(offs)

        def per_chunk(args):
            ti, off = args
            tiles_c = shard_tiles(slice_canvas(latents, off))
            img_c = shard_tiles(slice_canvas(image_latent_tiles, off))
            model_in = jnp.repeat(tiles_c, 2, axis=0)
            model_in = sched.scale_model_input(state, model_in, i)
            return self.unet_apply(
                unet_params, model_in, t, ctx_c, pooled_c,
                jnp.repeat(ti, 2, axis=0), jnp.repeat(img_c, 2, axis=0),
                add_sample, 2, **unet_kw)

        n_chunks = p_count // chunk

        def r(x):
            return x.reshape(n_chunks, chunk, *x.shape[1:])

        eps = jax.lax.map(per_chunk, (r(time_ids_part), r(offsets_part)))
        eps = eps.reshape(p_count, 2, *eps.shape[2:])
        eps_uncond, eps_text = eps[:, 0], eps[:, 1]
        eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
        if guidance_rescale > 0.0:
            eps = rescale_noise_cfg(eps, eps_text, guidance_rescale)
        tiles_part = slice_canvas(latents, offsets_part)
        return sched.step(state, eps, i, tiles_part)

    # ------------------------------------------------------------------
    # host orchestration
    # ------------------------------------------------------------------

    def __call__(
        self,
        lr_image: np.ndarray,                  # [H, W, 3] float [0,1] or uint8
        prompt_embeds: jax.Array,              # [1, 77*, 2048] positive
        pooled_prompt_embeds: jax.Array,       # [1, 1280]
        negative_prompt_embeds: Optional[jax.Array] = None,
        negative_pooled_prompt_embeds: Optional[jax.Array] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        guidance_rescale: Optional[float] = None,
        overlap: Optional[float] = None,
        start_point: Optional[str] = None,
        add_sample: Optional[bool] = None,
        color_fix: Optional[str] = None,
        seed: int = 0,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",   # "np" float [0,1] | "uint8" | "latent"
        noise_source: str = "jax",
        checkpoint_dir: Optional[str] = None,
    ) -> np.ndarray:
        cfg = self.config
        num_inference_steps = num_inference_steps or cfg.num_inference_steps
        guidance_scale = (cfg.guidance_scale if guidance_scale is None
                          else guidance_scale)
        guidance_rescale = (cfg.guidance_rescale if guidance_rescale is None
                            else guidance_rescale)
        overlap = cfg.tile_overlap if overlap is None else overlap
        start_point = start_point or cfg.start_point
        add_sample = cfg.add_sample if add_sample is None else add_sample
        color_fix = cfg.color_fix if color_fix is None else color_fix

        h, w = lr_image.shape[:2]
        if h % 8 or w % 8:
            raise ValueError(
                f"input must be /8-padded (use utils.image.check_image_size);"
                f" got {h}x{w}")
        target_size = (h, w)
        original_size = (h, w)
        lh, lw = h // 8, w // 8
        tile_k = (min(cfg.tile_size // 8, lh), min(cfg.tile_size // 8, lw))
        layout = compute_tile_layout(lh, lw, tile_k, overlap)

        key = jax.random.PRNGKey(seed)
        key, k_lat, k_vae = jax.random.split(key, 3)

        # ONE upload of the raw input (uint8 stays uint8: 4x less tunnel
        # traffic); normalization happens on device, and the raw device
        # buffer is reused as the color-fix source (round 4 re-uploaded it)
        lr_dev = jnp.asarray(lr_image)                         # [H, W, 3]
        image = self._jit_prep(lr_dev[None])                   # [1, H, W, 3]

        # LQ features via denoise_encoder (`prepare_image_latents`, :950-1004)
        image_latents = self.denoise_encoder_apply(
            self.denoise_encoder_params, image)
        # lazy mode: above the chunk threshold keep the feature map unsplit
        # and slice per-chunk inside the loop — materialising every tile is
        # ~4x the map (overlap 0.5), an OOM at 8K-class tile counts. Works
        # with tile sharding too: the map is replicated and each device
        # slices its own chunk (see `_denoise_loop`).
        lazy_tiles = (self.tile_chunk is not None
                      and layout.num_tiles > self.tile_chunk)
        image_latent_tiles = (image_latents if lazy_tiles
                              else split_tiles(image_latents, layout))

        # initial latents (`prepare_latents`, :819-835)
        state = self.scheduler.set_timesteps(num_inference_steps)
        if latents is None:
            if noise_source == "torch":
                latents = torch_randn_latents_nhwc(seed, lh, lw)
            else:
                latents = jax.random.normal(k_lat, (1, lh, lw, 4), jnp.float32)
        latents = latents * state.init_noise_sigma

        if start_point == "lr":
            # noise the LR latent to t=999 (`:1271-1276`): the scaled random
            # latents act as the DDPM noise term
            lr_latents = self.vae_encode(self.vae_params, image, k_vae)
            latents = self.ddpm_scheduler.add_noise(
                lr_latents, latents, jnp.array([999]))

        # negative embeds: zeros (force_zeros_for_empty_prompt, `:622-625`)
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        if negative_pooled_prompt_embeds is None:
            negative_pooled_prompt_embeds = jnp.zeros_like(pooled_prompt_embeds)
        embeds = jnp.concatenate(
            [negative_prompt_embeds, prompt_embeds], axis=0)
        pooled = jnp.concatenate(
            [negative_pooled_prompt_embeds, pooled_prompt_embeds], axis=0)

        # per-tile add_time_ids: [orig, (i, j) latent offset, target]
        # (`:1337-1345` — tile offsets in latent units, sizes in pixels)
        pos = tile_position_ids(layout).astype(np.float32)
        base_time_ids = np.concatenate(
            [
                np.tile(np.asarray(original_size, np.float32), (layout.num_tiles, 1)),
                pos,
                np.tile(np.asarray(target_size, np.float32), (layout.num_tiles, 1)),
            ],
            axis=1,
        )

        # pad the tile batch to a multiple of the tile-parallel device count
        # and the chunk size (padded tiles are compute-only; merge ignores
        # them)
        pad_base = max(self.tile_devices, 1)
        if self.tile_chunk:
            assert self.tile_chunk % pad_base == 0, (
                "tile_chunk must be a multiple of tile_devices")
            if layout.num_tiles > self.tile_chunk:
                pad_base = self.tile_chunk
        pad_tiles = (-layout.num_tiles) % pad_base
        tile_offsets = np.asarray(layout.offsets, np.int32)    # [T, 2]
        if pad_tiles:
            idx = np.arange(pad_tiles) % layout.num_tiles
            if not lazy_tiles:
                image_latent_tiles = jnp.concatenate(
                    [image_latent_tiles, image_latent_tiles[idx]], axis=0)
            base_time_ids = np.concatenate(
                [base_time_ids, base_time_ids[idx]], axis=0)
            tile_offsets = np.concatenate(
                [tile_offsets, tile_offsets[idx]], axis=0)
        if self.tile_sharding is not None:
            if lazy_tiles:
                # unsplit feature map: replicate across the mesh so every
                # device can slice any of its tiles locally
                rep = jax.sharding.NamedSharding(
                    self.tile_sharding.mesh, jax.sharding.PartitionSpec())
                image_latent_tiles = jax.device_put(image_latent_tiles, rep)
            else:
                image_latent_tiles = jax.device_put(
                    image_latent_tiles, self.tile_sharding)

        common_args = (
            self.unet_params, latents, image_latent_tiles, embeds, pooled,
            jnp.asarray(base_time_ids), layout, num_inference_steps,
            float(guidance_scale), float(guidance_rescale), bool(add_sample),
            pad_tiles, self.tile_chunk,
        )
        common_kw = dict(lazy_tiles=lazy_tiles,
                         tile_offsets=jnp.asarray(tile_offsets))
        if layout.num_tiles > self.host_loop_tile_threshold:
            # per-step dispatches (dynamic step index, one compile). With
            # `checkpoint_dir`, each step's merged canvas is persisted so a
            # crashed long run (tunnel kernel fault mid-8K) RESUMES at the
            # next step instead of restarting — the Euler update is
            # stateless given (canvas, step index), so post-step latents
            # fully capture progress.
            resume_step = 0
            ck_meta = None
            if checkpoint_dir is not None:
                ck_meta = {
                    "seed": int(seed), "h": int(h), "w": int(w),
                    "steps": int(num_inference_steps),
                    "overlap": float(overlap),
                    "guidance": float(guidance_scale),
                    "rescale": float(guidance_rescale),
                    "noise_source": noise_source,
                    "start_point": start_point,
                    "add_sample": bool(add_sample),
                    # conditioning + initial-latents + weight identity: a
                    # re-invocation with a different caption, caller-supplied
                    # latents, or swapped checkpoint must NOT resume the
                    # stale canvas (it would silently mix conditionings)
                    "cond_hash": _content_hash(embeds, pooled),
                    "init_latents_hash": _content_hash(latents),
                    "params_fp": _params_fingerprint(self.unet_params),
                }
                resumed = _canvas_ckpt_load(checkpoint_dir, ck_meta)
                if resumed is not None:
                    resume_step, lat_np = resumed
                    latents = jnp.asarray(lat_np)

            # split-dispatch mode: at extreme tile counts even ONE step's
            # chunk loop exceeds the tunnel's ~60 s dispatch kill (8K at
            # overlap 0.25 = 211 iterations) — run each step as several
            # part dispatches + one merge dispatch
            t_pad = layout.num_tiles + pad_tiles
            n_chunks_total = (t_pad // self.tile_chunk
                              if lazy_tiles and self.tile_chunk else 1)
            cap = self.max_chunks_per_dispatch
            if cap is not None and n_chunks_total > cap:
                chunk = self.tile_chunk
                n_parts = -(-n_chunks_total // cap)
                part = -(-t_pad // (n_parts * chunk)) * chunk
                tot = n_parts * part
                extra = np.arange(tot - t_pad) % layout.num_tiles
                all_tids = np.concatenate(
                    [base_time_ids, base_time_ids[extra]], axis=0)
                all_off = np.concatenate(
                    [tile_offsets, tile_offsets[extra]], axis=0)
                for i in range(resume_step, num_inference_steps):
                    stepped = [
                        self._jit_denoise_part(
                            self.unet_params, latents, image_latent_tiles,
                            embeds, pooled,
                            jnp.asarray(all_tids[p * part:(p + 1) * part]),
                            jnp.asarray(all_off[p * part:(p + 1) * part]),
                            jnp.asarray(i), layout=layout,
                            num_steps=num_inference_steps,
                            guidance_scale=float(guidance_scale),
                            guidance_rescale=float(guidance_rescale),
                            add_sample=bool(add_sample), tile_chunk=chunk)
                        for p in range(n_parts)]
                    tiles = jnp.concatenate(
                        stepped, axis=0)[:layout.num_tiles]
                    latents = self._jit_merge(tiles, layout=layout)
                    if ck_meta is not None:
                        _canvas_ckpt_save(checkpoint_dir, ck_meta, i,
                                          np.asarray(latents))
            else:
                for i in range(resume_step, num_inference_steps):
                    args = (common_args[0], latents) + common_args[2:]
                    latents = self._jit_denoise(
                        *args, step_indices=jnp.asarray([i]), **common_kw)
                    if ck_meta is not None:
                        _canvas_ckpt_save(checkpoint_dir, ck_meta, i,
                                          np.asarray(latents))
        else:
            if checkpoint_dir is not None:
                import warnings

                warnings.warn(
                    "checkpoint_dir is ignored on the single-dispatch scan "
                    f"path ({layout.num_tiles} tiles <= host_loop_tile_"
                    f"threshold={self.host_loop_tile_threshold}): the whole "
                    "denoise loop is one device dispatch, so there are no "
                    "per-step canvases to persist or resume.",
                    stacklevel=2)
            latents = self._jit_denoise(*common_args, **common_kw)

        # free the LQ-feature tiles before decode (870 MB at 4K-class sizes)
        del common_args, image_latent_tiles

        if output_type == "latent":
            return latents

        # denormalize + decode + color fix (`:1423-1452`)
        to_uint8 = output_type == "uint8"
        if self.config.use_tiled_vae:
            # tile-by-tile decode outside the fusion (memory-bounded), then
            # STREAMING color fix assembled on host: the one-fusion fix
            # holds ~10 full-res buffers live and OOMs at 8192²
            from ..utils.color_fix import streaming_color_fix

            latents = self._jit_denorm(latents)
            image_out = self.vae_decode(self.vae_params, latents)
            return streaming_color_fix(
                image_out, lr_dev,
                mode=color_fix, to_uint8=to_uint8, denorm=True)
        image_out = self._jit_postprocess(
            self.vae_params, latents, lr_dev[None], color_fix=color_fix,
            to_uint8=to_uint8)
        return np.asarray(image_out[0])
