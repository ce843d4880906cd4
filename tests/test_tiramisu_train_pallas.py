"""Pallas custom-VJP train-forward parity gates: ``pallas_apply_train``
must match ``fast_apply_train`` (same key -> same dropout realization,
same outputs, same batch-stat updates) and the flax apply's gradients on
dropout_rate=0 models — interpret mode under the CPU test mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import tiny_model

from sim2real_lane_segment_tpu.core.dtypes import F32_POLICY
from sim2real_lane_segment_tpu.models.tiramisu import FCDenseNet
from sim2real_lane_segment_tpu.models.tiramisu_fast import fast_apply_train
from sim2real_lane_segment_tpu.models.tiramisu_train_pallas import (
    pallas_apply_train, supports)


def _init_with_stats(model, key, shape):
    x0 = jax.random.normal(key, shape)
    variables = model.init(jax.random.key(0), x0)
    out, updates = model.apply(variables, x0, train=True,
                               rngs={"dropout": jax.random.key(1)},
                               mutable=["batch_stats"])
    return {"params": variables["params"],
            "batch_stats": updates["batch_stats"]}


def _nodropout_model():
    return FCDenseNet(n_classes=4, down_blocks=(2, 2), up_blocks=(2, 2),
                      bottleneck_layers=2, growth_rate=4,
                      out_chans_first_conv=8, policy=F32_POLICY,
                      dropout_rate=0.0)


@pytest.fixture(scope="module")
def setup():
    model = _nodropout_model()
    variables = _init_with_stats(model, jax.random.key(2), (2, 24, 32, 3))
    x = jax.random.normal(jax.random.key(3), (2, 24, 32, 3))
    return model, variables, x


@pytest.mark.slow
def test_matches_flax_apply_nodropout(setup):
    model, variables, x = setup
    ref, mut = model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.key(0)},
                           mutable=["batch_stats"], use_softmax=False)
    out, new_bs = pallas_apply_train(model, variables, x, jax.random.key(0),
                                     use_softmax=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    ref_bs = mut["batch_stats"]
    assert (jax.tree_util.tree_structure(ref_bs) ==
            jax.tree_util.tree_structure(new_bs))
    for a, b in zip(jax.tree_util.tree_leaves(new_bs),
                    jax.tree_util.tree_leaves(ref_bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_matches_fast_train_with_dropout_exactly():
    """Same key => the SAME dropout realization as fast_apply_train (the
    masks are drawn with the identical bernoulli call), so outputs match
    even at dropout_rate=0.2."""
    model = tiny_model()  # dropout 0.2
    variables = _init_with_stats(model, jax.random.key(4), (2, 24, 32, 3))
    x = jax.random.normal(jax.random.key(5), (2, 24, 32, 3))
    ref, ref_bs = jax.jit(lambda v, xx, k: fast_apply_train(
        model, v, xx, k, use_softmax=False))(variables, x, jax.random.key(6))
    out, new_bs = jax.jit(lambda v, xx, k: pallas_apply_train(
        model, v, xx, k, use_softmax=False, interpret=True))(
        variables, x, jax.random.key(6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(new_bs),
                    jax.tree_util.tree_leaves(ref_bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_grads_match_flax_nodropout(setup):
    model, variables, x = setup

    def loss_ref(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.key(0)},
            mutable=["batch_stats"], use_softmax=False)
        return jnp.mean(out ** 2)

    def loss_tp(params):
        out, _ = pallas_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(0), use_softmax=False, interpret=True)
        return jnp.mean(out ** 2)

    g_ref = jax.grad(loss_ref)(variables["params"])
    g_tp = jax.grad(loss_tp)(variables["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_tp = jax.tree_util.tree_leaves(g_tp)
    assert len(flat_ref) == len(flat_tp)
    for (path, a), b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))


def test_grads_match_flax_nodropout_small():
    """Unmarked (fast-CI) grads-vs-Flax gate at minimum size: one cheap
    end-to-end parity case that exercises every rewritten kernel's VJP
    (dense block, pool, transposed conv, classifier) so kernel
    regressions cannot slip through `pytest -m "not slow"` (the full
    ladder lives in the slow-marked tests above)."""
    model = FCDenseNet(n_classes=4, down_blocks=(1,), up_blocks=(1,),
                       bottleneck_layers=1, growth_rate=4,
                       out_chans_first_conv=8, policy=F32_POLICY,
                       dropout_rate=0.0)
    variables = _init_with_stats(model, jax.random.key(2), (1, 8, 16, 3))
    x = jax.random.normal(jax.random.key(3), (1, 8, 16, 3))

    def loss_ref(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.key(0)},
            mutable=["batch_stats"], use_softmax=False)
        return jnp.mean(out ** 2)

    def loss_tp(params):
        out, _ = pallas_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(0), use_softmax=False, interpret=True)
        return jnp.mean(out ** 2)

    # jit the whole grad: eager per-primitive dispatch is ~2x slower and
    # cannot hit the persistent compile cache (conftest)
    g_ref = jax.jit(jax.grad(loss_ref))(variables["params"])
    g_tp = jax.jit(jax.grad(loss_tp))(variables["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_tp = jax.tree_util.tree_leaves(g_tp)
    assert len(flat_ref) == len(flat_tp)
    for (path, a), b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))


def test_grads_match_with_dropout_vs_fast():
    """With dropout active the realizations coincide, so gradients must
    match the fast path leaf-for-leaf too.  Minimum size that still
    threads a dropout mask through every kernel site (the multi-level
    ladder runs under the slow mark) — this and the nodropout gate above
    are the two fast-CI kernel-VJP gates, so both stay cheap.
    bottleneck_layers=2 keeps one MULTI-layer dense block in the dropout
    VJP path (ADVICE r03: a single-layer block never exercises the
    dropout gradient across the intra-block concat); batch 1 offsets the
    extra layer's interpret-mode cost — dropout2d masks are per
    (sample, channel), so one sample still threads a mask through every
    kernel site."""
    model = FCDenseNet(n_classes=4, down_blocks=(1,), up_blocks=(1,),
                       bottleneck_layers=2, growth_rate=4,
                       out_chans_first_conv=8, policy=F32_POLICY,
                       dropout_rate=0.2)
    variables = _init_with_stats(model, jax.random.key(7), (1, 8, 16, 3))
    x = jax.random.normal(jax.random.key(8), (1, 8, 16, 3))

    def loss_fast(params):
        out, _ = fast_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(9), use_softmax=False)
        return jnp.mean(out ** 2)

    def loss_tp(params):
        out, _ = pallas_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(9), use_softmax=False, interpret=True)
        return jnp.mean(out ** 2)

    g_fast = jax.jit(jax.grad(loss_fast))(variables["params"])
    g_tp = jax.jit(jax.grad(loss_tp))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_odd_size_ladder():
    """The 30x40 -> 3-level odd-size crop/pool bookkeeping must agree."""
    model = FCDenseNet(n_classes=4, down_blocks=(2, 2, 2), up_blocks=(2, 2, 2),
                       bottleneck_layers=2, growth_rate=4,
                       out_chans_first_conv=8, policy=F32_POLICY,
                       dropout_rate=0.0)
    variables = _init_with_stats(model, jax.random.key(10), (1, 30, 40, 3))
    x = jax.random.normal(jax.random.key(11), (1, 30, 40, 3))
    ref, _ = model.apply(variables, x, train=True,
                         rngs={"dropout": jax.random.key(0)},
                         mutable=["batch_stats"], use_softmax=False)
    out, _ = pallas_apply_train(model, variables, x, jax.random.key(0),
                                use_softmax=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_reverse_features_grads_match_fast(setup):
    """MME's adversarial phase: grad_reverse applied per segment must
    flip exactly the same cotangents as the fast path's."""
    from sim2real_lane_segment_tpu.train.losses import adentropy

    model, variables, x = setup

    def loss_fast(params):
        probs, _ = fast_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(0), reverse_features=True)
        return adentropy(probs, 0.1)

    def loss_tp(params):
        probs, _ = pallas_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(0), reverse_features=True, interpret=True)
        return adentropy(probs, 0.1)

    g_fast = jax.grad(loss_fast)(variables["params"])
    g_tp = jax.grad(loss_tp)(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-3)


@pytest.mark.slow
def test_supervised_pallas_train_step_matches_standard_nodropout():
    """SupervisedTrainer(pallas_train=True) reproduces the standard
    step's logs on a dropout_rate=0 model."""
    from sim2real_lane_segment_tpu.train.supervised import SupervisedTrainer

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.integers(0, 255, (4, 24, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (4, 24, 32), dtype=np.uint8))
    key, lr = jax.random.key(7), jnp.float32(1e-3)

    logs = {}
    for pallas in (False, True):
        tr = SupervisedTrainer(num_cls=4, height=24, width=32, augment=True,
                               model=_nodropout_model(), pallas_train=pallas)
        assert tr.pallas_train == pallas
        state = tr.init_state(jax.random.key(0))
        _, lg = tr.train_step(state, images, labels, key, lr)
        logs[pallas] = jax.device_get(lg)
    for name in logs[False]:
        np.testing.assert_allclose(logs[True][name], logs[False][name],
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_mme_pallas_train_step_matches_standard_nodropout():
    from sim2real_lane_segment_tpu.train.mme import MMETrainer

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 255, (4, 24, 32, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, 4, (4, 24, 32), dtype=np.uint8))
    img_u = jnp.asarray(rng.integers(0, 255, (4, 24, 32, 3), dtype=np.uint8))
    key = jax.random.key(9)

    logs = {}
    for pallas in (False, True):
        tr = MMETrainer(num_cls=4, height=24, width=32, augment=True,
                        model=_nodropout_model(), pallas_train=pallas)
        state = tr.init_state(jax.random.key(0))
        lrs = tr.lrs_at(0)
        _, lg = tr.mme_train_step(state, img, y, img_u, key, *lrs)
        logs[pallas] = jax.device_get(lg)
    for name in logs[False]:
        np.testing.assert_allclose(logs[True][name], logs[False][name],
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_block_bwd_matches_per_consumer_path():
    """The fused block backward (default) and the legacy per-consumer
    custom-VJP path (S2R_FUSED_BLOCK_BWD=0) are the same math with
    different HBM materialization — at f32 policy the gradients must
    agree to float-accumulation noise, with dropout active (so the
    dropout-mask, relu-tie, and stats-correction paths are all
    exercised).  The env flag is read at trace time, so each path is
    traced under its own setting."""
    import os

    model = tiny_model()  # dropout 0.2, two multi-layer blocks per side
    variables = _init_with_stats(model, jax.random.key(12), (2, 24, 32, 3))
    x = jax.random.normal(jax.random.key(13), (2, 24, 32, 3))

    def loss(params):
        out, _ = pallas_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(14), use_softmax=False, interpret=True)
        return jnp.mean(out ** 2)

    grads = {}
    for flag in ("1", "0"):
        os.environ["S2R_FUSED_BLOCK_BWD"] = flag
        try:
            grads[flag] = jax.jit(jax.grad(loss))(variables["params"])
        finally:
            del os.environ["S2R_FUSED_BLOCK_BWD"]
    for a, b in zip(jax.tree_util.tree_leaves(grads["1"]),
                    jax.tree_util.tree_leaves(grads["0"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_supports_reports_feasibility():
    assert supports(tiny_model(), 24, 32)
    from sim2real_lane_segment_tpu.models.tiramisu import fcdensenet67
    assert supports(fcdensenet67(4), 120, 160)
    # a deliberately enormous resolution must be rejected
    assert not supports(fcdensenet67(4), 1200, 1600)
