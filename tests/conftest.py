"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (the TPU answer to "test distributed
without a cluster" — SURVEY.md §4)."""
import os

# Force CPU even if the surrounding environment selects a TPU platform
# (e.g. JAX_PLATFORMS=axon): unit tests must be fast, local, and fp32-exact.
# NOTE: the env var alone is not enough under the axon plugin — the explicit
# config.update below is what actually wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: UNet fwd/bwd compiles dominate test time.
# Keep it INSIDE the repo: /tmp is wiped at round boundaries (gitignored)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache", "tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu", jax.devices()
