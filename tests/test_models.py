"""Model parity gates: parameter counts and output shapes vs golden values
measured once from the reference torch models (see SURVEY.md §2.1).

Golden counts (trainable params, BN affine included, running stats excluded):
  FCDenseNet57(n_classes=4)  = 1_375_444
  FCDenseNet67(n_classes=4)  = 3_461_220   (base 3_460_064 + classifier 1_156)
  FCDenseNet103(n_classes=4) = 9_320_292
  FCDenseNet67 featureChannels = 288
  EncDecNet(64, 3, 7)        = 7_237_570
  EncDecNet(64, 3, 3)        = 1_331_650
  GeneratorResNet(3ch, 9 res)= 11_378_179
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sim2real_lane_segment_tpu.core.dtypes import F32_POLICY
from sim2real_lane_segment_tpu.models import (
    EncDecNet, GeneratorResNet, fcdensenet57, fcdensenet67, fcdensenet103,
    fcdensenet67_base_classifier, grad_reverse)


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def x120():
    return jnp.zeros((1, 120, 160, 3), jnp.float32)


@pytest.mark.parametrize("factory,golden", [
    (fcdensenet57, 1_375_444),
    (fcdensenet67, 3_461_220),
    (fcdensenet103, 9_320_292),
])
def test_fcdensenet_param_counts(factory, golden, x120):
    # eval_shape: structure without compiling the (huge) init graph
    model = factory(4)
    variables = jax.eval_shape(model.init, jax.random.key(0), x120)
    assert n_params(variables["params"]) == golden


def test_fcdensenet67_split_counts(x120):
    base, clf = fcdensenet67_base_classifier(4)
    v = jax.eval_shape(base.init, jax.random.key(0), x120)
    assert n_params(v["params"]) == 3_460_064
    assert base.feature_channels == 288
    feats = jnp.zeros((1, 120, 160, 288))
    vc = jax.eval_shape(clf.init, jax.random.key(0), feats)
    assert n_params(vc["params"]) == 1_156


def small_fcdensenet(num_cls=4, policy=F32_POLICY):
    """Same module family, small config — full FCDenseNet67 forwards run
    under jit on TPU (bench.py / __graft_entry__); un-jitted eager init of
    the 67-layer graph takes minutes on CPU, so CPU unit tests exercise
    the architecture at reduced width/depth."""
    from sim2real_lane_segment_tpu.models.tiramisu import FCDenseNet
    return FCDenseNet(n_classes=num_cls, down_blocks=(2, 2, 2),
                      up_blocks=(2, 2, 2), bottleneck_layers=2,
                      growth_rate=6, out_chans_first_conv=12, policy=policy)


def test_fcdensenet_forward_shape_and_softmax(x120):
    # 120x160 through 3 pool levels: 120->60->30->15 and back up — the
    # same odd-size center-crop bookkeeping as the full model.
    model = small_fcdensenet()
    # jitted init/apply: one cacheable executable instead of eager
    # per-primitive dispatch (conftest persistent cache)
    variables = jax.jit(model.init)(jax.random.key(0), x120)
    out = jax.jit(model.apply)(variables, x120)
    assert out.shape == (1, 120, 160, 4)
    # softmax head: sums to 1 per pixel (reference torch out.sum() == H*W
    # == 19200.0, measured; verified for the full 67 on TPU in bench)
    np.testing.assert_allclose(np.asarray(out.sum()), 120 * 160, rtol=1e-4)


def test_feature_extractor_l2_normalized():
    from sim2real_lane_segment_tpu.models.tiramisu import FCDenseNetFeatureExtractor
    base = FCDenseNetFeatureExtractor(down_blocks=(2, 2), up_blocks=(2, 2),
                                      bottleneck_layers=2, growth_rate=6,
                                      out_chans_first_conv=12,
                                      policy=F32_POLICY)
    x = jax.random.uniform(jax.random.key(1), (1, 48, 64, 3))
    v = jax.jit(base.init)(jax.random.key(0), x)
    feats = jax.jit(base.apply)(v, x)
    norms = np.asarray(jnp.linalg.norm(feats, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_train_mode_runs_with_dropout_and_bn():
    # smallest config that still has a skip-concat level: the train-mode
    # semantics (dropout + batch-stat BN) don't depend on depth/width,
    # and the deeper ladders run under the slow mark / parity gates
    from sim2real_lane_segment_tpu.models.tiramisu import FCDenseNet
    model = FCDenseNet(n_classes=4, down_blocks=(2, 2), up_blocks=(2, 2),
                       bottleneck_layers=2, growth_rate=4,
                       out_chans_first_conv=8, policy=F32_POLICY)
    x0 = jnp.zeros((1, 24, 32, 3))
    variables = jax.jit(model.init)(jax.random.key(0), x0)
    x = jax.random.uniform(jax.random.key(1), (2, 24, 32, 3))
    out, mutated = jax.jit(
        lambda v, xx, k: model.apply(v, xx, train=True,
                                     rngs={"dropout": k},
                                     mutable=["batch_stats"]))(
        variables, x, jax.random.key(2))
    assert out.shape == (2, 24, 32, 4)
    assert "batch_stats" in mutated
    # running stats actually moved away from init
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.parametrize("nfeat,nlev,k,golden", [
    (64, 3, 7, 7_237_570),
    (64, 3, 3, 1_331_650),
])
def test_encdecnet_param_count(nfeat, nlev, k, golden, x120):
    model = EncDecNet(n_features=nfeat, n_levels=nlev, kernel_size=k)
    variables = jax.eval_shape(model.init, jax.random.key(0), x120)
    assert n_params(variables["params"]) == golden


def test_encdecnet_forward():
    model = EncDecNet(n_features=8, n_levels=3, kernel_size=3, policy=F32_POLICY)
    x = jnp.ones((1, 48, 64, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 48, 64, 2)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_fcdensenet_remat_parity():
    """remat=True must change memory behavior only: identical param tree,
    bit-identical eval forward/grads, train-mode within float noise (the
    checkpoint barriers change fusion order, not semantics)."""
    from sim2real_lane_segment_tpu.models.tiramisu import FCDenseNet
    kw = dict(n_classes=4, down_blocks=(2, 2), up_blocks=(2, 2),
              bottleneck_layers=2, growth_rate=4, out_chans_first_conv=8,
              policy=F32_POLICY)
    m0, m1 = FCDenseNet(**kw), FCDenseNet(**kw, remat=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 24, 32, 3)),
                    jnp.float32)
    v = m0.init(jax.random.key(0), x)
    v1 = m1.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(v1))

    def loss(params, mdl, train):
        if train:
            out, _ = mdl.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                train=True, rngs={"dropout": jax.random.key(1)},
                mutable=["batch_stats"])
        else:
            out = mdl.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                train=False)
        return jnp.sum(out ** 2)

    for train, tol in ((False, 0.0), (True, 1e-3)):
        l0, g0 = jax.value_and_grad(loss)(v["params"], m0, train)
        l1, g1 = jax.value_and_grad(loss)(v["params"], m1, train)
        np.testing.assert_allclose(float(l0), float(l1), rtol=tol or 0)
        md = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), g0, g1)))
        assert md <= tol, f"train={train}: max grad diff {md}"


def test_cyclegan_generator_param_count(x120):
    model = GeneratorResNet(num_residual_blocks=9)
    variables = jax.eval_shape(model.init, jax.random.key(0), x120)
    assert n_params(variables["params"]) == 11_378_179


def test_cyclegan_generator_forward():
    x = jnp.zeros((1, 32, 40, 3), jnp.float32)
    model = GeneratorResNet(num_residual_blocks=2)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 32, 40, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_grad_reverse():
    def f(x):
        return jnp.sum(grad_reverse(x) * 3.0)
    g = jax.grad(f)(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(g), -3.0)


def test_grad_reverse_forward_identity():
    x = jnp.arange(5.0)
    np.testing.assert_array_equal(np.asarray(grad_reverse(x)), np.asarray(x))
