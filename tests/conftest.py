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

# persistent compilation cache: the heavy suite graphs (8-dev train step,
# engine buckets) are byte-identical across tests and suite runs; without
# this every Trainer/DEVO instance recompiles them (10+ min apiece)
_cache = os.path.expanduser("~/.cache/devo_tpu_xla_tests")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_caches_between_modules():
    """The full suite accumulates dozens of large compiled executables in
    one process; late tests then segfault INSIDE XLA:CPU (seen both in
    backend_compile_and_load and in compilation-cache deserialization,
    always in the last test module). Dropping the in-memory jit caches
    between modules bounds that state; the disk cache keeps re-loads
    cheap."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; jax backend was already instantiated as "
        f"{jax.default_backend()}")
    assert jax.device_count() == 8
    config.addinivalue_line(
        "markers", "slow: long-running integration test (engine golden, "
        "checkpoint resume)")
    config.addinivalue_line(
        "markers", "fullmatrix: exhaustive-variant leg of a test matrix; "
        "skipped by default (VERDICT r03: the interpret-mode banded engine "
        "matrix took the suite to 68 min). Run with DEVO_FULL_SUITE=1; the "
        "fast default keeps one representative per matrix so the shipping "
        "configuration stays covered on every run.")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("DEVO_FULL_SUITE", "").strip() in ("1", "true", "yes"):
        return
    skip = pytest.mark.skip(
        reason="fullmatrix variant; set DEVO_FULL_SUITE=1 to run")
    for item in items:
        if "fullmatrix" in item.keywords:
            item.add_marker(skip)
