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
