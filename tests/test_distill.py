"""LaneNetLite student + distillation step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sim2real_lane_segment_tpu.core.dtypes import F32_POLICY
from sim2real_lane_segment_tpu.models.lanenet_lite import LaneNetLite
from sim2real_lane_segment_tpu.train.distill import DistillTrainer

from helpers import tiny_model

H, W = 24, 32


@pytest.mark.slow
def test_lanenet_lite_forward():
    m = LaneNetLite(n_classes=4, policy=F32_POLICY)
    x = jnp.zeros((2, 120, 160, 3))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 120, 160, 4)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_lanenet_lite_param_budget():
    m = LaneNetLite(n_classes=4)
    v = jax.eval_shape(m.init, jax.random.key(0),
                       jnp.zeros((1, 120, 160, 3), jnp.float32))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n < 1_500_000, f"student too big: {n}"


@pytest.mark.slow
def test_distill_step_learns(rng):
    # teacher = the small FCDenseNet used across tests; student small too
    teacher = tiny_model()
    tv = teacher.init(jax.random.key(0), jnp.zeros((1, H, W, 3)))
    student = LaneNetLite(n_classes=4, stem=(8, 16),
                          body=((16, 1), (16, 1)), policy=F32_POLICY)
    tr = DistillTrainer(teacher_model=teacher, teacher_params=tv["params"],
                        teacher_batch_stats=tv["batch_stats"],
                        height=H, width=W, augment=False,
                        student_model=student)
    state = tr.init_state(jax.random.key(1))

    img = rng.integers(0, 80, (4, H, W, 3), dtype=np.uint8)
    img[:, :, W // 2:, 1] += 120
    y = np.zeros((4, H, W), np.uint8)
    y[:, :, W // 2:] = 1

    key = jax.random.key(2)
    first = last = None
    for i in range(25):
        key, k = jax.random.split(key)
        state, logs = tr.train_step(state, img, y, k, tr.lr_at(0))
        if first is None:
            first = float(logs["tr_loss"])
        last = float(logs["tr_loss"])
    assert last < first, (first, last)
    out = tr.eval_step(state, img, y)
    assert np.isfinite(float(out["loss"]))


def test_distill_step_unl_target_kd(rng):
    """Target-domain KD step (train/distill.py docstring): runs on
    MME-style ((x_lab, y), x_unl) batches via default_step_fn; with
    alpha=1 (pure KD) the labels must not influence the loss — CE is
    confined to the labelled rows and weighted out."""
    teacher = tiny_model()
    tv = teacher.init(jax.random.key(0), jnp.zeros((1, H, W, 3)))
    student = LaneNetLite(n_classes=4, stem=(8, 16),
                          body=((16, 1), (16, 1)), policy=F32_POLICY)

    # one trainer (= one jitted step compile): alpha=1 gives pure KD, so
    # the same instance checks both the dispatch path and the CE/KD
    # separation; the blended alpha=0.7 objective trains in the slow
    # test_distill_step_learns above
    tr = DistillTrainer(
        teacher_model=teacher, teacher_params=tv["params"],
        teacher_batch_stats=tv["batch_stats"], height=H, width=W,
        augment=False, alpha=1.0, student_model=student)

    img = rng.integers(0, 255, (4, H, W, 3), dtype=np.uint8)
    unl = rng.integers(0, 255, (6, H, W, 3), dtype=np.uint8)
    y0 = rng.integers(0, 4, (4, H, W)).astype(np.uint8)
    y1 = (y0 + 1) % 4

    state = tr.init_state(jax.random.key(1))
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])  # pre-donation
    state2, logs = tr.default_step_fn(state, ((img, y0), unl),
                                      jax.random.key(2), 0)
    assert np.isfinite(float(logs["tr_loss"]))
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(p0, np.asarray(p2))

    s = tr.init_state(jax.random.key(1))
    _, la = tr.train_step_unl(s, img, y0, unl, jax.random.key(3),
                              jnp.float32(1e-3))
    s = tr.init_state(jax.random.key(1))
    _, lb = tr.train_step_unl(s, img, y1, unl, jax.random.key(3),
                              jnp.float32(1e-3))
    assert float(la["tr_loss"]) == float(lb["tr_loss"])
    assert float(la["tr_ce"]) != float(lb["tr_ce"])  # ce computed, unweighted


def test_legacy_flat_artifact_loads():
    """artifacts/lanenet_lite_sim.msgpack predates the featureExtractor/
    classifier split; load_weights must remap the flat layout."""
    import os

    from sim2real_lane_segment_tpu.train import checkpoint as ckpt
    from sim2real_lane_segment_tpu.train.supervised import SupervisedTrainer

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "lanenet_lite_sim.msgpack")
    trainer = SupervisedTrainer(num_cls=4, augment=False,
                                model=LaneNetLite(n_classes=4))
    state = trainer.init_state(jax.random.key(0))
    loaded = ckpt.load_weights(path, state)
    # weights actually changed (not left at init) and predict runs
    k0 = jax.tree_util.tree_leaves(state.params)[0]
    k1 = jax.tree_util.tree_leaves(loaded.params)[0]
    assert not np.allclose(np.asarray(k0), np.asarray(k1))
    out = trainer.predict_step(
        loaded, np.zeros((1, 120, 160, 3), np.uint8))
    assert out.shape == (1, 120, 160)


def test_serve_apply_matches_reference_path():
    """serve_apply (restructured NCHW tail + flat normalize) must agree
    with the plain eval_batch -> model.apply -> argmax serving path."""
    from sim2real_lane_segment_tpu.models.lanenet_lite import serve_apply
    from sim2real_lane_segment_tpu.ops.augment import AugmentConfig, eval_batch

    m = LaneNetLite(n_classes=4, policy=F32_POLICY)
    v = m.init(jax.random.key(0), jnp.zeros((1, 120, 160, 3)))
    u8 = jnp.asarray(np.random.default_rng(7).integers(
        0, 255, (4, 120, 160, 3), dtype=np.uint8))

    x, _ = eval_batch(u8, None, AugmentConfig(), with_labels=False)
    ref = jnp.argmax(m.apply(v, x, use_softmax=False), axis=-1)
    out = serve_apply(m, v, u8)
    assert out.dtype == jnp.uint8
    agree = float(jnp.mean((ref == out).astype(jnp.float32)))
    assert agree >= 0.999, agree
