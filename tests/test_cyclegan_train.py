"""CycleGAN training (train/cyclegan.py): step mechanics, replay pool,
learning signal on toy domains, and save/convert compatibility."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sim2real_lane_segment_tpu.models.cyclegan import (Discriminator,
                                                       GeneratorResNet)
from sim2real_lane_segment_tpu.train.cyclegan import (CycleGANTrainer,
                                                      ImagePool,
                                                      fit_cyclegan)

H, W = 16, 16


def toy_domains(n=8, seed=0):
    """Domain A: red-shifted noise; domain B: blue-shifted noise."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-0.3, 0.3, (2 * n, H, W, 3)).astype(np.float32)
    a, b = base[:n].copy(), base[n:].copy()
    a[..., 2] += 0.5   # BGR: red channel up in A
    b[..., 0] += 0.5   # blue channel up in B
    return np.clip(a, -1, 1), np.clip(b, -1, 1)


def make_trainer():
    return CycleGANTrainer(num_residual_blocks=1)


def test_discriminator_patch_grid():
    d = Discriminator()
    params = d.init(jax.random.key(0), jnp.zeros((2, 64, 64, 3)))
    out = d.apply(params, jnp.zeros((2, 64, 64, 3)))
    # 4 stride-2 blocks: 64 -> 4 spatial, 1 score channel per patch
    assert out.shape == (2, 4, 4, 1)
    assert out.dtype == jnp.float32


@pytest.mark.slow
def test_train_step_updates_and_is_finite():
    tr = make_trainer()
    state = tr.init_state(jax.random.key(0), H, W)
    a, b = toy_domains(2)
    new_state, (fa, fb), logs = tr.train_step(state, a[:2], b[:2],
                                              a[:2], b[:2])
    for k, v in logs.items():
        assert np.isfinite(float(v)), (k, v)
    assert fa.shape == (2, H, W, 3) and fb.shape == (2, H, W, 3)
    assert float(jnp.max(jnp.abs(fa))) <= 1.0  # tanh range
    # all four networks actually moved (any-leaf: at this toy 16x16 size
    # the deepest D convs sit behind a single-pixel InstanceNorm whose
    # gradient is identically zero — a scale artifact, not a bug)
    for old, new in ((state.g_ab, new_state.g_ab),
                     (state.g_ba, new_state.g_ba),
                     (state.d_a, new_state.d_a),
                     (state.d_b, new_state.d_b)):
        moved = any(
            not np.allclose(np.asarray(l0), np.asarray(l1))
            for l0, l1 in zip(jax.tree_util.tree_leaves(old),
                              jax.tree_util.tree_leaves(new)))
        assert moved


@pytest.mark.slow
def test_fit_reduces_cycle_and_identity_loss():
    tr = make_trainer()
    state = tr.init_state(jax.random.key(1), H, W)
    a, b = toy_domains(8, seed=3)
    state, hist = fit_cyclegan(tr, state, a, b, epochs=8, batch_size=4,
                               seed=0)
    early = hist[0]["loss_cyc"] + hist[0]["loss_id"]
    late = hist[-1]["loss_cyc"] + hist[-1]["loss_id"]
    assert late < early, (early, late)


def test_image_pool_mixes_history():
    pool = ImagePool(size=4, seed=0)
    first = np.arange(4, dtype=np.float32).reshape(4, 1, 1, 1)
    out1 = pool.query(first)
    np.testing.assert_array_equal(out1, first)  # pool fills untouched
    second = first + 100
    out2 = pool.query(second)
    # with p=0.5 swaps over 4 images, some outputs come from history
    assert out2.min() < 100 and out2.max() >= 100


def test_saved_generator_loads_into_convert_template():
    from flax import serialization

    tr = make_trainer()
    state = tr.init_state(jax.random.key(2), H, W)
    blob = serialization.to_bytes({"params": jax.device_get(state.g_ab)})
    # the exact template sim2real_convert builds (cli/sim2real_convert.py)
    model = GeneratorResNet(num_residual_blocks=1)
    template = model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)))
    restored = serialization.from_bytes(template, blob)
    y = model.apply(restored, jnp.zeros((1, H, W, 3)))
    assert y.shape == (1, H, W, 3)
