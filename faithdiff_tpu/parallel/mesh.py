"""Mesh construction and sharding helpers.

TPU-native replacement for the reference's NCCL/DeepSpeed distribution
(`/root/reference/dataloader/accelerate_config.yaml`, SURVEY.md §2.8):
- `data` axis: data parallelism for training (grad psum over ICI) and tile
  parallelism for tiled inference (tiles are embarrassingly parallel)
- optimizer-state sharding over `data` (the ZeRO-2 equivalent) is expressed
  as NamedSharding on optax state leaves; XLA inserts reduce-scatter /
  all-gather as needed
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch / tile) dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def shard_leading_divisible(
    tree: Any, mesh: Mesh, axis: str = "data"
) -> Any:
    """ZeRO-style sharding rule: shard a pytree leaf's first dim over `axis`
    when divisible, replicate otherwise. Applied to optimizer state so each
    chip holds 1/N of Adam moments (reference ZeRO-2,
    `accelerate_config.yaml:3-11`)."""
    n = mesh.shape[axis]

    def spec(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] % n == 0 \
                and leaf.shape[0] >= n:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)
