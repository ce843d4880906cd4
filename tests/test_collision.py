"""Collision / proximity-penalty tests (SAT OBB-vs-OBB + safety circles)."""
import numpy as np

import jax.numpy as jnp

from sim2real_lane_segment_tpu.sim import collision as C


def obj(x, z, r):
    return [x, z, r, 0.1, 0, 0, 0, 0.0]


def obb_obj(x, z, hx, hz, theta, r=0.1):
    # full 12-wide render.py row: [x, z, radius, h, r, g, b, annot,
    # draw_cyl, hx, hz, theta]
    return [x, z, r, 0.1, 0, 0, 0, 0.0, 0.0, hx, hz, theta]


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


def test_obb_long_barrier():
    # a 0.5x0.1 m barrier alongside the agent: its true box reaches the
    # agent only along x; the old r=0.15 circle model got both wrong
    barrier = jnp.asarray([obb_obj(0.0, 0.2, 0.25, 0.05, 0.0)])
    # agent at origin: barrier near edge at z=0.15, agent half-width 0.06
    # -> clear
    assert not bool(C.collides_with_objects(jnp.asarray([0.0, 0.0]),
                                            jnp.asarray(0.0), barrier))
    # agent moved to z=0.1: gap 0.05 < 0.06 -> hit anywhere along the
    # 0.5 m span, including x=0.2 (outside a 0.15 circle at the center)
    assert bool(C.collides_with_objects(jnp.asarray([0.2, 0.1]),
                                        jnp.asarray(0.0), barrier))
    # ... but NOT past the barrier's end (x=0.35 > hx + agent reach)
    assert not bool(C.collides_with_objects(jnp.asarray([0.4, 0.1]),
                                            jnp.asarray(0.0), barrier))


def test_obb_rotated_barrier():
    # same barrier yawed 90°: the long axis now runs along z
    barrier = jnp.asarray([obb_obj(0.3, 0.0, 0.25, 0.05, np.pi / 2)])
    # along x the rotated footprint is only 0.05 half-wide: agent at
    # origin (half-length 0.09) clears the near face at x=0.25
    assert not bool(C.collides_with_objects(jnp.asarray([0.0, 0.0]),
                                            jnp.asarray(0.0), barrier))
    # but along z it now spans ±0.25: agent at (0.3, 0.2) sits inside it
    assert bool(C.collides_with_objects(jnp.asarray([0.3, 0.2]),
                                        jnp.asarray(0.0), barrier))


def test_obb_diagonal_yaw_not_mirrored():
    # 45°-yawed long box: corner reaches toward +x,-z (agent convention:
    # heading (cos t, -sin t)); a sign error would mirror it to +x,+z
    box = jnp.asarray([obb_obj(0.3, -0.25, 0.25, 0.02, np.pi / 4)])
    hit = C.collides_with_objects(jnp.asarray([0.12, -0.1]),
                                  jnp.asarray(np.pi / 4), box)
    miss = C.collides_with_objects(jnp.asarray([0.12, 0.1]),
                                   jnp.asarray(-np.pi / 4), box)
    assert bool(hit) and not bool(miss)


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
