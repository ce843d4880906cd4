"""Fused-Pallas FC-DenseNet inference parity gate: ``pallas_apply`` (VMEM-
resident dense blocks, kn2row tap packing) must match the ordinary flax
forward on the same variables — interpret mode under the CPU test mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import tiny_model

from sim2real_lane_segment_tpu.core.dtypes import F32_POLICY
from sim2real_lane_segment_tpu.models.tiramisu import DenseBlock, FCDenseNet
from sim2real_lane_segment_tpu.models.tiramisu_pallas import (
    _fold_block_params, fused_dense_block, pallas_apply)


def _init_with_stats(model, key, shape):
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


def _block_setup(h, w, c, growth, n_layers):
    blk = DenseBlock(growth_rate=growth, n_layers=n_layers, upsample=False,
                     policy=F32_POLICY)
    x0 = jax.random.normal(jax.random.key(0), (2, h, w, c))
    variables = blk.init(jax.random.key(1), x0, train=False)
    _, upd = blk.apply(variables, x0, train=True,
                       rngs={"dropout": jax.random.key(2)},
                       mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    x = jax.random.normal(jax.random.key(3), (2, h, w, c))
    ref = blk.apply(variables, x, train=False)
    k_max = c + (n_layers - 1) * growth
    folded = _fold_block_params(variables["params"],
                                variables["batch_stats"],
                                n_layers, growth, k_max, jnp.float32)
    return x, ref, folded


def test_fused_block_exact():
    """A single fused DenseBlock matches flax in f32."""
    x, ref, folded = _block_setup(12, 16, 8, 4, 2)
    out, real = fused_dense_block([(x, x.shape[-1])], folded, n_layers=2,
                                  growth=4, c_lo=0, interpret=True)
    assert real == out.shape[-1]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_block_tiled_halo():
    """Row tiling (overlap-shrink halo) must not change the output."""
    x, ref, folded = _block_setup(12, 16, 8, 4, 2)
    out, _ = fused_dense_block([(x, x.shape[-1])], folded, n_layers=2,
                               growth=4, c_lo=0, tile_rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_block_new_features_only():
    """c_lo=c_in reproduces the DenseBlock ``upsample`` variant."""
    x, ref, folded = _block_setup(8, 8, 8, 4, 2)
    out, _ = fused_dense_block([(x, x.shape[-1])], folded, n_layers=2,
                               growth=4, c_lo=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[..., 8:]),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pallas_apply_matches_standard(setup):
    model, variables, x = setup
    ref = model.apply(variables, x, train=False, use_softmax=False)
    out = pallas_apply(model, variables, x, use_softmax=False,
                       interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_apply_softmax_and_argmax(setup):
    model, variables, x = setup
    # jitted: one cacheable executable per side (conftest persistent cache)
    ref = jax.jit(lambda v, xx: model.apply(
        v, xx, train=False, use_softmax=True))(variables, x)
    out = jax.jit(lambda v, xx: pallas_apply(
        model, v, xx, use_softmax=True, interpret=True))(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_array_equal(np.argmax(np.asarray(out), -1),
                                  np.argmax(np.asarray(ref), -1))


@pytest.mark.slow
def test_pallas_apply_odd_sizes():
    """The 160x120 odd-size ladder (H not a power of two) must crop and
    pad identically through the fused path."""
    model = FCDenseNet(n_classes=4, down_blocks=(2, 2, 2), up_blocks=(2, 2, 2),
                       bottleneck_layers=2, growth_rate=4,
                       out_chans_first_conv=8, policy=F32_POLICY)
    variables = _init_with_stats(model, jax.random.key(4), (1, 30, 40, 3))
    x = jax.random.normal(jax.random.key(5), (1, 30, 40, 3))
    ref = model.apply(variables, x, train=False, use_softmax=False)
    out = pallas_apply(model, variables, x, use_softmax=False,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_apply_wide_classifier_kernel():
    model = FCDenseNet(n_classes=4, down_blocks=(2,), up_blocks=(2,),
                       bottleneck_layers=2, growth_rate=4,
                       out_chans_first_conv=8, kernel_size=3,
                       policy=F32_POLICY)
    variables = _init_with_stats(model, jax.random.key(6), (1, 16, 16, 3))
    x = jax.random.normal(jax.random.key(7), (1, 16, 16, 3))
    ref = jax.jit(lambda v, xx: model.apply(
        v, xx, train=False, use_softmax=False))(variables, x)
    out = jax.jit(lambda v, xx: pallas_apply(
        model, v, xx, use_softmax=False, interpret=True))(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_block_multi_segment():
    """The virtual-concat input (list of segments) must equal running the
    block on the concatenated tensor (the up-path entry shape)."""
    x, ref, folded = _block_setup(12, 16, 8, 4, 2)
    a, bseg = x[..., :3], x[..., 3:]
    out, _ = fused_dense_block([(a, 3), (bseg, 5)], folded, n_layers=2,
                               growth=4, c_lo=0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_block_lane_padded_segments():
    """Segments carrying zero pad lanes (the TPU-alignment contract) give
    the same result, with the output zero-padded to out_lanes."""
    x, ref, folded = _block_setup(12, 16, 8, 4, 2)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 8)))
    out, real = fused_dense_block([(xp, 8)], folded, n_layers=2, growth=4,
                                  c_lo=0, interpret=True)
    assert real == 16
    np.testing.assert_allclose(np.asarray(out[..., :16]), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_predict_step_fused_matches_standard():
    """The CLI-facing fused predictor must produce the same class maps as
    the standard jitted predict_step."""
    from sim2real_lane_segment_tpu.train.supervised import SupervisedTrainer

    trainer = SupervisedTrainer(num_cls=4, augment=False, model=tiny_model(),
                                height=24, width=32)
    state = trainer.init_state(jax.random.key(0))
    imgs = np.asarray(
        jax.random.randint(jax.random.key(1), (2, 24, 32, 3), 0, 255),
        np.uint8)
    ref = np.asarray(trainer.predict_step(state, imgs))
    out = np.asarray(trainer.predict_step_fused(state, imgs))
    np.testing.assert_array_equal(out, ref)
