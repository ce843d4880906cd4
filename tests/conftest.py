"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; the standard JAX substitute is
``xla_force_host_platform_device_count`` (see SURVEY.md §4).

The session environment pins ``JAX_PLATFORMS=axon`` (the tunneled TPU
chip, where compiles take minutes) and a sitecustomize imports jax before
any test code runs — so the env var cannot be overridden here.  The
backend itself initializes lazily, so ``jax.config.update`` before first
device use reliably forces CPU.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA:CPU compiles of the jitted train/eval
# programs dominate suite wall time (measured 76 s -> 7 s for one tiny
# train step on this box).  Keyed by HLO hash, so correctness-neutral;
# first run is cold, every later run is fast.
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR",
                            os.path.expanduser("~/.cache/jax_s2r_tests"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))  # make tests/helpers.py importable


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, not the tunneled TPU")
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)
