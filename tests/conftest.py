"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; the standard JAX substitute is
``xla_force_host_platform_device_count`` (see SURVEY.md §4).  Env vars must
be set before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
