"""Checkpoint / resume via orbax.

Capability-equivalent to the reference's cooperating mechanisms (SURVEY.md
§5 "Checkpoint / resume"):
- periodic `save_state` with rotation by `checkpoints_total_limit`
  (`/root/reference/train_SDXL_stage_1.py:955-979`)
- resume from the latest `checkpoint-N` (`:827-849`)
- EMA state saved alongside (`:656-689`)
- export of a flat inference state dict ("FaithDiff.bin" equivalent) —
  here the converted-back param pytree saved standalone

Sharded arrays are first-class: orbax restores with the meshes/shardings of
the provided abstract target, replacing DeepSpeed's zero_to_fp32 dance
(`README.md:82-93`).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .train import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 2000):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state._asdict()), force=force)
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure/shardings of `state_like`."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                state_like._asdict())
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))
        return TrainState(**restored)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any) -> None:
    """Standalone param pytree export (inference checkpoint)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str, params_like: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if params_like is None:
        return ckptr.restore(os.path.abspath(path))
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, params_like)
    return ckptr.restore(os.path.abspath(path), abstract)
