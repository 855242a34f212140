"""Test configuration: force an 8-device CPU platform so multi-chip
sharding (mesh/pjit/shard_map) semantics are exercised without TPUs.

The container's sitecustomize registers the axon TPU backend and pins
JAX_PLATFORMS=axon, so the env var alone is not enough — we must also
flip the platform via jax.config after import. XLA_FLAGS still has to
be set before the CPU backend is first initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
