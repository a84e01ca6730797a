"""Multi-host initialisation.

TPU-native replacement for the reference's NCCL rendezvous
(`/root/reference/dataloader/accelerate_config.yaml:18-24`: static rdzv,
machine_rank, main port): `jax.distributed.initialize` wires all hosts of a
pod slice into one JAX runtime; every host then sees the global device set
and the same pjit program runs SPMD over ICI/DCN.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialise multi-host JAX. No-ops on a single host.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; explicit values mirror the reference's accelerate config fields
    (main_process_ip/port -> coordinator, num_machines -> num_processes,
    machine_rank -> process_id).
    Returns the process index."""
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR")
    n = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 0)) or None
    pid = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)
    if explicit or (n and n > 1):
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=n,
            process_id=pid,
        )
    return jax.process_index()


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host should feed (per-host data
    loading for pjit with `jax.make_array_from_process_local_data`)."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
