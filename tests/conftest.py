"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip logic is tested without a TPU pod via the JAX CPU backend with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4) — the JAX-native
analog of a fake multi-node backend. Environment must be set BEFORE jax is
imported anywhere, hence this module-level block in conftest.
"""

import os

# Force-override: this machine exports JAX_PLATFORMS=axon (the tunneled
# TPU); tests must run on the local virtual 8-device CPU backend. Note
# JAX_PLATFORM_NAME is the knob that actually wins over the axon plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: XLA CPU compiles of the 608x160 ResNet
# dominate suite wall-clock (fast lane 42 min cold on this 1-core
# host); repeat runs hit the cache and drop most of it. Keyed by
# backend+topology (stable: cpu x8 above), safe to share across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/depthvo_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# Belt and braces: plugins (chex/flax) may import jax before this conftest
# runs, in which case the env vars above are too late — but the config API
# still works until a backend is actually initialized.
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # backend already initialized: env vars must have won
    pass

assert jax.default_backend() == "cpu", "tests must not run on the tunneled TPU"
assert len(jax.devices()) == 8, "tests need the virtual 8-device CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
