"""Batched on-device rollout: shapes, determinism, label-extraction chain."""
import numpy as np

import jax

from sim2real_lane_segment_tpu.ops.labelgen import process_classes
from sim2real_lane_segment_tpu.sim import lanes, render, rollout
from sim2real_lane_segment_tpu.sim.maps import builtin_map

H, W = 60, 80


def setup():
    m = builtin_map("small_loop")
    scene = render.build_scene(m, 0)
    la = lanes.build_lane_arrays(m)
    return m, scene, la


def test_rollout_shapes_and_stability():
    m, scene, la = setup()
    rng = np.random.default_rng(0)
    pos, angle = rollout.sample_spawns(m, la, rng, 2)
    batch = rollout.expert_rollout(scene, la, jax.random.key(0), pos, angle,
                                   tile_size=m.tile_size, n_steps=8,
                                   height=H, width=W)
    assert batch.orig.shape == (8, 2, H, W, 3)
    assert batch.annot.shape == (8, 2, H, W, 3)
    assert batch.pos.shape == (8, 2, 2)
    # agents stay in lane through the chunk
    for t in range(8):
        for b in range(2):
            lp = jax.device_get(lanes.lane_pos(
                la, m.tile_size, batch.pos[t, b], batch.angle[t, b]))
            assert bool(lp.in_lane)


def test_rollout_deterministic():
    m, scene, la = setup()
    rng = np.random.default_rng(1)
    pos, angle = rollout.sample_spawns(m, la, rng, 1)
    a = rollout.expert_rollout(scene, la, jax.random.key(5), pos, angle,
                               tile_size=m.tile_size, n_steps=4,
                               height=H, width=W)
    b = rollout.expert_rollout(scene, la, jax.random.key(5), pos, angle,
                               tile_size=m.tile_size, n_steps=4,
                               height=H, width=W)
    np.testing.assert_array_equal(np.asarray(a.orig), np.asarray(b.orig))


def test_rollout_pairs_decode_to_labels():
    """Rollout pairs -> process_classes recovers lane classes (the full
    on-device datagen chain)."""
    m, scene, la = setup()
    rng = np.random.default_rng(2)
    pos, angle = rollout.sample_spawns(m, la, rng, 1)
    batch = rollout.expert_rollout(scene, la, jax.random.key(0), pos, angle,
                                   tile_size=m.tile_size, n_steps=4,
                                   height=120, width=160,
                                   domain_rand=False)
    orig = np.asarray(batch.orig[:, 0])
    annot = np.asarray(batch.annot[:, 0])
    masks = np.asarray(process_classes(orig, annot, channel_order="rgb"))
    # the agent drives the right lane: class 1 should dominate foreground
    counts = np.bincount(masks.reshape(-1), minlength=4)
    assert counts[1] > 100
