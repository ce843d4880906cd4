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


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# train mode (fast_apply_train)
# ---------------------------------------------------------------------------

def _nodropout_model():
    """dropout_rate=0 isolates the deterministic train-mode semantics
    (batch-stat BN + running updates) from flax's path-derived masks."""
    return FCDenseNet(n_classes=4, down_blocks=(2, 2), up_blocks=(2, 2),
                      bottleneck_layers=2, growth_rate=4,
                      out_chans_first_conv=8, policy=F32_POLICY,
                      dropout_rate=0.0)


def _train_setup():
    from sim2real_lane_segment_tpu.models.tiramisu_fast import \
        fast_apply_train
    model = _nodropout_model()
    variables = _init_with_stats(model, jax.random.key(8), (2, 24, 32, 3))
    x = jax.random.normal(jax.random.key(9), (2, 24, 32, 3))
    return fast_apply_train, model, variables, x


def test_fast_apply_train_matches_standard_nodropout():
    fast_apply_train, model, variables, x = _train_setup()
    ref, mut = model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.key(0)},
                           mutable=["batch_stats"], use_softmax=False)
    fast, new_bs = fast_apply_train(model, variables, x, jax.random.key(0),
                                    use_softmax=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    # running-stat updates must match leaf for leaf
    ref_bs = mut["batch_stats"]
    assert (jax.tree_util.tree_structure(ref_bs) ==
            jax.tree_util.tree_structure(new_bs))
    for a, b in zip(jax.tree_util.tree_leaves(new_bs),
                    jax.tree_util.tree_leaves(ref_bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_fast_apply_train_grads_match_nodropout():
    fast_apply_train, model, variables, x = _train_setup()

    def loss_ref(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.key(0)},
            mutable=["batch_stats"], use_softmax=False)
        return jnp.mean(out ** 2)

    def loss_fast(params):
        out, _ = fast_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(0), use_softmax=False)
        return jnp.mean(out ** 2)

    g_ref = jax.grad(loss_ref)(variables["params"])
    g_fast = jax.grad(loss_fast)(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)


def test_fast_train_dropout_is_channelwise_and_scaled():
    from sim2real_lane_segment_tpu.models.tiramisu_fast import _dropout2d
    x = jnp.ones((64, 6, 7, 32))
    y = np.asarray(_dropout2d(jax.random.key(0), x, 0.2))
    # masks broadcast over H, W: each (sample, channel) plane is constant
    flat = y.reshape(64, -1, 32)
    assert np.all((flat == 0).all(axis=1) | (flat == flat[:, :1]).all(axis=1))
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 1.0 / 0.8, rtol=1e-6)
    # drop fraction near the rate
    assert abs(float((y == 0).mean()) - 0.2) < 0.03


def test_fast_train_with_dropout_runs_and_updates_stats():
    from sim2real_lane_segment_tpu.models.tiramisu_fast import \
        fast_apply_train
    model = tiny_model()  # dropout_rate 0.2
    variables = _init_with_stats(model, jax.random.key(10), (2, 24, 32, 3))
    x = jax.random.normal(jax.random.key(11), (2, 24, 32, 3))
    out, new_bs = fast_apply_train(model, variables, x, jax.random.key(12))
    assert out.shape == (2, 24, 32, 4)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)
    # stats moved (momentum update applied)
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(new_bs),
                             jax.tree_util.tree_leaves(
                                 variables["batch_stats"]))]
    assert all(moved)


def test_fast_train_reverse_features_grads_match_flax_small():
    """Unmarked (fast-CI) adversarial-gradient gate at minimum size: the
    slow-marked gate below and the pallas reverse_features gate are both
    deselected under `-m "not slow"`, so without this case an MME
    grad_reverse regression would only surface at merge (ADVICE r03).
    One down block at 8x16 keeps both grad-graph compiles cheap."""
    from sim2real_lane_segment_tpu.models.tiramisu_fast import \
        fast_apply_train
    from sim2real_lane_segment_tpu.train.losses import adentropy
    from sim2real_lane_segment_tpu.train.mme import MMETrainer

    model = FCDenseNet(n_classes=4, down_blocks=(1,), up_blocks=(1,),
                       bottleneck_layers=1, growth_rate=4,
                       out_chans_first_conv=8, policy=F32_POLICY,
                       dropout_rate=0.0)
    variables = _init_with_stats(model, jax.random.key(12), (2, 8, 16, 3))
    x = jax.random.normal(jax.random.key(13), (2, 8, 16, 3))
    tr = MMETrainer(num_cls=4, height=8, width=16, augment=False,
                    model=model)

    def loss_flax(params):
        probs, _ = tr._forward_adversarial(
            params, variables["batch_stats"], x, jax.random.key(0))
        return adentropy(probs, 0.1)

    def loss_fast(params):
        probs, _ = fast_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(0), reverse_features=True)
        return adentropy(probs, 0.1)

    # jit both grads: eager dispatch is slower and uncacheable (conftest)
    g_flax = jax.jit(jax.grad(loss_flax))(variables["params"])
    g_fast = jax.jit(jax.grad(loss_fast))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                    jax.tree_util.tree_leaves(g_flax)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


@pytest.mark.slow
def test_fast_train_reverse_features_grads_match_flax_adversarial():
    """grad_reverse applied per segment before the fused norm+classifier
    head must reproduce the flax adversarial path's gradients (MME phase
    G, mme.py _forward_adversarial) — gr is a linear identity, so it
    commutes through the (deterministic) normalization.

    Slow-marked (two full grad-graph compiles, the heaviest test in the
    fast set): fast CI keeps step-level fast_train coverage via
    test_matches_fast_train_with_dropout_exactly and the pallas kernel
    VJP gates; `make test` runs this gate on merge."""
    from sim2real_lane_segment_tpu.models.tiramisu_fast import \
        fast_apply_train
    from sim2real_lane_segment_tpu.train.losses import adentropy
    from sim2real_lane_segment_tpu.train.mme import MMETrainer

    model = _nodropout_model()
    variables = _init_with_stats(model, jax.random.key(12), (2, 24, 32, 3))
    x = jax.random.normal(jax.random.key(13), (2, 24, 32, 3))
    tr = MMETrainer(num_cls=4, height=24, width=32, augment=False,
                    model=model)

    def loss_flax(params):
        probs, _ = tr._forward_adversarial(
            params, variables["batch_stats"], x, jax.random.key(0))
        return adentropy(probs, 0.1)

    def loss_fast(params):
        probs, _ = fast_apply_train(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            x, jax.random.key(0), reverse_features=True)
        return adentropy(probs, 0.1)

    g_flax = jax.grad(loss_flax)(variables["params"])
    g_fast = jax.grad(loss_fast)(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                    jax.tree_util.tree_leaves(g_flax)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


@pytest.mark.slow
def test_mme_fast_train_step_matches_standard_nodropout():
    """MMETrainer(fast_train=True) reproduces the standard MME step's
    losses on a dropout_rate=0 model."""
    from sim2real_lane_segment_tpu.train.mme import MMETrainer

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 255, (4, 24, 32, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, 4, (4, 24, 32), dtype=np.uint8))
    img_u = jnp.asarray(rng.integers(0, 255, (4, 24, 32, 3), dtype=np.uint8))
    key = jax.random.key(9)

    logs = {}
    for fast in (False, True):
        tr = MMETrainer(num_cls=4, height=24, width=32, augment=True,
                        model=_nodropout_model(), fast_train=fast)
        state = tr.init_state(jax.random.key(0))
        lrs = tr.lrs_at(0)
        _, lg = tr.mme_train_step(state, img, y, img_u, key, *lrs)
        logs[fast] = jax.device_get(lg)
    for name in logs[False]:
        np.testing.assert_allclose(logs[True][name], logs[False][name],
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_supervised_fast_train_step_matches_standard_nodropout():
    """SupervisedTrainer(fast_train=True) reproduces the standard step's
    logs on a dropout_rate=0 model (the only stochastic difference is
    dropout realization, removed here)."""
    from sim2real_lane_segment_tpu.train.supervised import SupervisedTrainer

    def make(fast):
        return SupervisedTrainer(num_cls=4, height=24, width=32,
                                 augment=True, model=_nodropout_model(),
                                 fast_train=fast)

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.integers(0, 255, (4, 24, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (4, 24, 32), dtype=np.uint8))
    key, lr = jax.random.key(7), jnp.float32(1e-3)

    logs = {}
    for fast in (False, True):
        tr = make(fast)
        state = tr.init_state(jax.random.key(0))
        _, lg = tr.train_step(state, images, labels, key, lr)
        logs[fast] = jax.device_get(lg)
    for name in logs[False]:
        np.testing.assert_allclose(logs[True][name], logs[False][name],
                                   rtol=1e-4, atol=1e-4)
