"""Collision / proximity-penalty tests (SAT OBB vs circles)."""
import numpy as np

import jax.numpy as jnp

from sim2real_lane_segment_tpu.sim import collision as C


def obj(x, z, r):
    return [x, z, r, 0.1, 0, 0, 0, 0.0]


def test_no_collision_far():
    objs = jnp.asarray([obj(5.0, 5.0, 0.1)])
    hit = C.collides_with_objects(jnp.asarray([0.0, 0.0]),
                                  jnp.asarray(0.0), objs)
    assert not bool(hit)


def test_collision_overlapping():
    objs = jnp.asarray([obj(0.05, 0.0, 0.1)])
    hit = C.collides_with_objects(jnp.asarray([0.0, 0.0]),
                                  jnp.asarray(0.0), objs)
    assert bool(hit)


def test_collision_rotated_obb():
    # object at 0.11 m: clears the half-width (0.06+0.03) but not the
    # half-length (0.09+0.03) — hits only when the agent yaws toward it
    objs = jnp.asarray([obj(0.0, 0.11, 0.03)])
    no_hit = C.collides_with_objects(jnp.asarray([0.0, 0.0]),
                                     jnp.asarray(0.0), objs)
    hit = C.collides_with_objects(jnp.asarray([0.0, 0.0]),
                                  jnp.asarray(-np.pi / 2), objs)
    assert not bool(no_hit) and bool(hit)


def test_proximity_penalty_sign():
    far = C.proximity_penalty(jnp.asarray([0.0, 0.0]), jnp.asarray(0.0),
                              jnp.asarray([obj(3.0, 0.0, 0.1)]))
    near = C.proximity_penalty(jnp.asarray([0.0, 0.0]), jnp.asarray(0.0),
                               jnp.asarray([obj(0.15, 0.0, 0.1)]))
    assert float(far) == 0.0
    assert float(near) < 0.0
    assert float(near) >= -1.0


def test_placeholder_object_row_is_inert():
    # render.build_scene emits [1e9, 1e9, 0, ...] when a map has no objects
    objs = jnp.asarray([[1e9, 1e9, 0.0, 0.0, 0, 0, 0, 0.0]])
    assert not bool(C.collides_with_objects(jnp.asarray([0.0, 0.0]),
                                            jnp.asarray(0.0), objs))
    assert float(C.proximity_penalty(jnp.asarray([0.0, 0.0]),
                                     jnp.asarray(0.0), objs)) == 0.0
