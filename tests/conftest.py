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

# NOTE: the persistent XLA compilation cache is deliberately NOT enabled
# for CPU tests: xla's cpu_aot_loader refuses to load its own serialized
# executables on some hosts (it records tuning pseudo-features like
# +prefer-no-scatter as required target features and then rejects them at
# load time), so every lookup errors and recompiles — pure overhead.
