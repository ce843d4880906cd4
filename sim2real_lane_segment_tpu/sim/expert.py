"""Lane-following expert controller.

Plays the role of the reference's PurePursuitExpert
(learning/utils/teacher.py:11-46) and of the human driver in
manual_control.py: a P-controller on (lane distance, heading error)
producing (velocity, steering) actions, good enough to keep the agent in
lane indefinitely for automated recording.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import lanes


def expert_action(lane_arrays, tile_size, pos, angle, *,
                  velocity: float = 0.5, k_dist: float = 8.0,
                  k_head: float = 4.0, k_slow: float = 0.12):
    """(velocity, steering) from the lane position — jit/vmap friendly.

    P-control on (lane distance, heading error) plus curvature
    FEED-FORWARD: through the duty conversion + kinematics chain
    (physics.py), commanded (velocity, steering) yield v and omega scaled
    by the same constant, so tracking an arc of curvature kappa needs
    exactly steering = velocity * kappa.  Tight turns (the r=0.25
    intersection/curve_right arcs) also slow down like a real driver.
    """
    lp = lanes.lane_pos(lane_arrays, tile_size, pos, angle)
    heading = jnp.stack([jnp.cos(angle), -jnp.sin(angle)])
    # signed heading error: cross = t_u*h_v - t_v*h_u is negative when the
    # heading points left of the lane tangent (world x east, z south).
    cross = lp.tangent[0] * heading[1] - lp.tangent[1] * heading[0]
    vel = velocity / (1.0 + k_slow * jnp.abs(lp.curvature))
    # dist > 0 = right of the lane center -> steer left (steering > 0);
    # heading left of tangent (cross < 0) -> steer right.
    steering = k_dist * lp.dist + k_head * cross + vel * lp.curvature
    vel = jnp.where(lp.in_lane, vel, 0.1)
    return jnp.stack([vel, jnp.clip(steering, -4.0, 4.0)])
