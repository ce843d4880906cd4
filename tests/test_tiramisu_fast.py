"""Segment-wise FC-DenseNet inference parity gate: fast_apply must match
the ordinary flax forward (same variables) at unchanged outputs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import tiny_model

from sim2real_lane_segment_tpu.core.dtypes import F32_POLICY
from sim2real_lane_segment_tpu.models.tiramisu import FCDenseNet
from sim2real_lane_segment_tpu.models.tiramisu_fast import fast_apply


def _init_with_stats(model, key, shape):
    """Init + one train-mode pass so batch_stats are non-trivial."""
    x0 = jax.random.normal(key, shape)
    variables = model.init(jax.random.key(0), x0)
    out, updates = model.apply(variables, x0, train=True,
                               rngs={"dropout": jax.random.key(1)},
                               mutable=["batch_stats"])
    return {"params": variables["params"],
            "batch_stats": updates["batch_stats"]}


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    variables = _init_with_stats(model, jax.random.key(2), (2, 24, 32, 3))
    x = jax.random.normal(jax.random.key(3), (2, 24, 32, 3))
    return model, variables, x


def test_fast_apply_matches_standard(setup):
    model, variables, x = setup
    ref = model.apply(variables, x, train=False, use_softmax=False)
    fast = fast_apply(model, variables, x, use_softmax=False)
    assert fast.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_fast_apply_softmax_and_argmax(setup):
    model, variables, x = setup
    ref = model.apply(variables, x, train=False, use_softmax=True)
    fast = fast_apply(model, variables, x, use_softmax=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-3)
    np.testing.assert_array_equal(np.argmax(np.asarray(fast), -1),
                                  np.argmax(np.asarray(ref), -1))


def test_fast_apply_odd_sizes():
    """The 160x120 odd-size ladder (120 -> ... -> 3) must crop identically."""
    model = FCDenseNet(n_classes=4, down_blocks=(2, 2, 2), up_blocks=(2, 2, 2),
                       bottleneck_layers=2, growth_rate=4,
                       out_chans_first_conv=8, policy=F32_POLICY)
    variables = _init_with_stats(model, jax.random.key(4), (1, 30, 40, 3))
    x = jax.random.normal(jax.random.key(5), (1, 30, 40, 3))
    ref = model.apply(variables, x, train=False, use_softmax=False)
    fast = fast_apply(model, variables, x, use_softmax=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_fast_apply_wide_classifier_kernel():
    model = FCDenseNet(n_classes=4, down_blocks=(2,), up_blocks=(2,),
                       bottleneck_layers=2, growth_rate=4,
                       out_chans_first_conv=8, kernel_size=3,
                       policy=F32_POLICY)
    variables = _init_with_stats(model, jax.random.key(6), (1, 16, 16, 3))
    x = jax.random.normal(jax.random.key(7), (1, 16, 16, 3))
    ref = model.apply(variables, x, train=False, use_softmax=False)
    fast = fast_apply(model, variables, x, use_softmax=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
