"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests must not require the real TPU; multi-chip sharding is validated
against XLA's host-platform virtual devices.

NB: the image's sitecustomize imports jax before pytest loads this file, so
env vars are too late — but the backend is not instantiated yet, so
jax.config updates still take effect.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; jax backend was already instantiated as "
        f"{jax.default_backend()}")
    assert jax.device_count() == 8
    config.addinivalue_line(
        "markers", "slow: long-running integration test (engine golden, "
        "checkpoint resume)")
