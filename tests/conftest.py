"""Test configuration: run on an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code is
validated on XLA's host-platform device simulation instead (the TPU answer
to multi-node testing without a cluster — see SURVEY.md §4).

Note: the environment pins JAX_PLATFORMS to the remote TPU plugin and a
sitecustomize imports jax at interpreter start, so plain env-var overrides
are too late — use jax.config.update instead (works pre-backend-init).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("RWKV_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
