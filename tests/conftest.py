"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests must not require the real TPU (CI runs on CPU); multi-chip sharding is
validated against XLA's host-platform virtual devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the image sets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
