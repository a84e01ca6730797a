"""faithdiff_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
diffusion-prior real-world image super-resolution with the capabilities of
FaithDiff (CVPR 2025).

The package is organised as:

- ``faithdiff_tpu.ops``        — Pallas/XLA compute kernels (flash attention, resize, filters)
- ``faithdiff_tpu.models``     — flax.linen model definitions (SDXL UNet + FaithDiff fusion,
                                 VAE, denoise encoder, CLIP text towers, BSRNet)
- ``faithdiff_tpu.schedulers`` — pure-functional diffusion schedulers with explicit state
- ``faithdiff_tpu.pipelines``  — tiled (TLC) restoration pipeline; tiling math
- ``faithdiff_tpu.parallel``   — mesh construction and sharding rules
- ``faithdiff_tpu.training``   — pjit train step, EMA, two-stage recipes
- ``faithdiff_tpu.data``       — Real-ESRGAN-style degradation engine, datasets
- ``faithdiff_tpu.utils``      — color fix, image helpers, checkpoint conversion

All image tensors are NHWC (TPU-native layout); the reference is NCHW.
"""

__version__ = "0.1.0"
