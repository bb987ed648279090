"""Test harness: force an 8-virtual-device CPU platform so multi-chip sharding
paths compile and execute without TPU hardware, and so tests are hermetic and
run with full f32 matmul precision.

Note: the ambient environment preloads jax (sitecustomize) with
JAX_PLATFORMS=axon, so env-var edits here are too late; we use jax.config
updates instead, which take effect as long as no backend is initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS path above covers it
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}; "
    "a TPU backend was initialized before conftest could configure jax"
)
assert len(jax.devices()) >= 8, "expected >=8 virtual CPU devices for sharding tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20231223)
