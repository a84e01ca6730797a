"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5: only tqdm + wall-clock logging).
Built here as a first-class subsystem:
- `phase(name)` context: wall-clock per phase with a process-global registry
- `trace(dir)` context: jax.profiler programmatic trace (TensorBoard format)
- `annotate(name)`: jax.profiler.TraceAnnotation for device-timeline labels
- `device_sync(x)`: tunnel-safe synchronisation (block_until_ready is a
  no-op under the axon tunnel — force a readback; see bench.py)
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

_PHASES: Dict[str, list] = defaultdict(list)


def device_sync(x: Any) -> float:
    """Force device completion by reading back a scalar reduction."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


@contextlib.contextmanager
def phase(name: str, sync: Any = None) -> Iterator[None]:
    """Time a pipeline phase (host wall-clock; pass `sync=arrays` to include
    device completion)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            device_sync(sync)
        _PHASES[name].append(time.perf_counter() - t0)


def phase_report(reset: bool = False) -> Dict[str, Dict[str, float]]:
    report = {}
    for name, times in _PHASES.items():
        report[name] = {
            "count": len(times),
            "total_s": sum(times),
            "mean_s": sum(times) / len(times),
            "last_s": times[-1],
        }
    if reset:
        _PHASES.clear()
    return report


def print_phase_report(reset: bool = True) -> None:
    for name, row in sorted(phase_report(reset).items()):
        print(f"[phase] {name}: n={row['count']} "
              f"mean={row['mean_s'] * 1e3:.1f}ms total={row['total_s']:.2f}s")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


def save_phase_report(path: str) -> None:
    with open(path, "w") as f:
        json.dump(phase_report(), f, indent=2)
