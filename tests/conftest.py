"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; shardings are validated on a
virtual host-platform mesh (the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip).
"""

import os
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin registers itself from sitecustomize before conftest
# runs; explicitly pin the platform back to CPU for unit tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: shape-stable kernels (jitted field
# primitives, the MiMC compression) compile once across ALL test processes.
import pathlib

_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
