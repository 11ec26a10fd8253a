"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require the real TPU; multi-chip sharding is validated on
XLA's host-platform virtual devices.

Note: the environment pre-imports parts of jax at interpreter startup (a
site hook), so JAX_PLATFORMS set here via os.environ is read too late —
`jax.config.update` is the reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
