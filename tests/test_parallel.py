"""Data-parallel correctness on the virtual 8-device CPU mesh:
mesh-sharded training must match single-device training on the same
global batch (the property whose absence broke the reference's DDP)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sim2real_lane_segment_tpu.core.mesh import make_mesh
from sim2real_lane_segment_tpu.parallel.sharding import (replicate,
                                                         shard_train_batch)
from sim2real_lane_segment_tpu.train.supervised import SupervisedTrainer

from helpers import tiny_model

H, W = 24, 32


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 devices")
def test_sharded_step_matches_single_device(rng):
    imgs = rng.integers(0, 255, (8, H, W, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (8, H, W), dtype=np.uint8)
    key = jax.random.key(3)
    lr = jnp.float32(1e-3)

    def run(mesh=None):
        tr = SupervisedTrainer(num_cls=4, height=H, width=W, augment=False,
                               model=tiny_model())
        state = tr.init_state(jax.random.key(0))
        if mesh is not None:
            state = state.replace(
                params=replicate(mesh, state.params),
                batch_stats=replicate(mesh, state.batch_stats),
                opt_state=replicate(mesh, state.opt_state))
            b = shard_train_batch(mesh, (imgs, labels))
        else:
            b = (imgs, labels)
        state, logs = tr.train_step(state, b[0], b[1], key, lr)
        return jax.device_get(state.params), float(logs["tr_loss"])

    p_single, loss_single = run()
    mesh = make_mesh(devices=jax.devices()[:4])
    p_shard, loss_shard = run(mesh)

    np.testing.assert_allclose(loss_single, loss_shard, rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves(p_single)
    flat_b = jax.tree_util.tree_leaves(p_shard)
    # Adam divides by sqrt(v): a gradient that is ~0 can flip sign under a
    # different cross-device reduction order, moving that scalar by up to
    # one lr-sized step — bound the divergence by half an lr step instead
    # of machine epsilon (the gradient agreement below is the tight check).
    for a, b in zip(flat_a, flat_b):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 5e-4


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 devices")
def test_sharded_gradients_match_single_device(rng):
    """The DP contract itself: psum-of-shard-gradients == global gradient."""
    from sim2real_lane_segment_tpu.ops.augment import eval_batch
    from sim2real_lane_segment_tpu.train.losses import weighted_cross_entropy

    imgs = rng.integers(0, 255, (8, H, W, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (8, H, W), dtype=np.uint8)
    tr = SupervisedTrainer(num_cls=4, height=H, width=W, augment=False,
                           model=tiny_model())
    state = tr.init_state(jax.random.key(0))

    @jax.jit
    def grads_of(params, batch_stats, images, lbls):
        def loss_fn(p):
            x, y = eval_batch(images, lbls, tr.cfg)
            out, _ = tr.model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"])
            return weighted_cross_entropy(out, y, 4)
        return jax.grad(loss_fn)(params)

    g_single = jax.device_get(grads_of(state.params, state.batch_stats,
                                       imgs, labels))
    mesh = make_mesh(devices=jax.devices()[:4])
    params_r = replicate(mesh, state.params)
    bs_r = replicate(mesh, state.batch_stats)
    b = shard_train_batch(mesh, (imgs, labels))
    g_shard = jax.device_get(grads_of(params_r, bs_r, b[0], b[1]))

    for a, bb in zip(jax.tree_util.tree_leaves(g_single),
                     jax.tree_util.tree_leaves(g_shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 devices")
def test_sampler_shards_compose_to_global_batch():
    """The per-shard index streams concatenate to the global stream."""
    from sim2real_lane_segment_tpu.data import samplers
    global_idx = samplers.shuffle_epoch(64, seed=5, epoch=2)
    batch_size, n_shards = 4, 4
    shards = [samplers.shard(global_idx, s, n_shards, batch_size)
              for s in range(n_shards)]
    # rebuild the global order batch by batch
    rebuilt = []
    for b in range(len(shards[0]) // batch_size):
        for s in range(n_shards):
            rebuilt.extend(shards[s][b * batch_size:(b + 1) * batch_size])
    np.testing.assert_array_equal(np.asarray(rebuilt), global_idx[:len(rebuilt)])