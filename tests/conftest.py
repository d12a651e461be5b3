"""Test harness: run everything on CPU with an 8-device virtual mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY §4).

Environment quirk: /root/.axon_site/sitecustomize.py imports jax at
interpreter start and sets jax_platforms="axon,cpu" via config — env vars
like JAX_PLATFORMS are overridden. We must update the config AFTER import
and clear any initialized backends.
"""

import os

# Strip the axon pool var BEFORE any test (or fixture) spawns a subprocess:
# a child inheriting it re-registers the TPU backend, touches the relay, and
# can wedge a concurrently running TPU job INDEFINITELY (observed: the
# test_experiments make_data subprocess froze a production-recipe run).
# The parent process already registered axon at interpreter start
# (sitecustomize); popping the env var here only protects children.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():  # axon may have initialized already
    from jax.extend.backend import clear_backends

    clear_backends()

jax.config.update("jax_default_matmul_precision", "float32")
# persistent compile cache: single-core CPU compiles are slow; cache across runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
    f"test harness needs 8 virtual CPU devices, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
