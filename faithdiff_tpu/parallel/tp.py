"""Tensor-parallel sharding rules for the SDXL UNet.

The reference has no tensor parallelism (SURVEY.md §2.8 — DP only); this is
a TPU-native addition: Megatron-style column/row sharding of the
transformer projections expressed as GSPMD `NamedSharding` annotations on
the param tree. XLA inserts the collectives; correctness is guaranteed by
SPMD semantics, the specs only steer layout:

- attention to_q/to_k/to_v kernels: shard the head (output) dim -> P(None, "model")
- attention to_out kernel: shard the input dim -> P("model", None)
- GEGLU ff proj: output dim; ff out: input dim
- everything else (convs, norms, embeddings): replicated

Used by `__graft_entry__.dryrun_multichip` over a ("data", "model") mesh and
available for large-batch serving where per-chip HBM is the constraint.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_SUFFIXES = ("to_q", "to_k", "to_v")   # shard output features
_ROW_SUFFIXES = ("to_out",)                   # shard input features


def unet_tp_shardings(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Build a NamedSharding tree matching `params` for tensor parallelism."""
    n = mesh.shape[axis]

    def spec_for(path, leaf) -> NamedSharding:
        names = [str(getattr(p, "key", p)) for p in path]
        leaf_name = names[-1]
        parent = names[-2] if len(names) >= 2 else ""
        gparent = names[-3] if len(names) >= 3 else ""
        if leaf_name == "kernel" and leaf.ndim == 2:
            if parent in _COLUMN_SUFFIXES and leaf.shape[1] % n == 0:
                return NamedSharding(mesh, P(None, axis))
            if parent in _ROW_SUFFIXES and leaf.shape[0] % n == 0:
                return NamedSharding(mesh, P(axis, None))
            # GEGLU: ff/net_0/proj column-sharded, ff/net_2 row-sharded
            if parent == "proj" and gparent == "net_0" \
                    and leaf.shape[1] % n == 0:
                return NamedSharding(mesh, P(None, axis))
            if parent == "net_2" and leaf.shape[0] % n == 0:
                return NamedSharding(mesh, P(axis, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_tp(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put the param tree with TP shardings."""
    shardings = unet_tp_shardings(params, mesh, axis)
    return jax.tree.map(jax.device_put, params, shardings)
