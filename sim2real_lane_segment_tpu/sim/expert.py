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
                  k_head: float = 4.0):
    """(velocity, steering) from the lane position — jit/vmap friendly."""
    lp = lanes.lane_pos(lane_arrays, tile_size, pos, angle)
    heading = jnp.stack([jnp.cos(angle), -jnp.sin(angle)])
    # signed heading error: cross = t_u*h_v - t_v*h_u is negative when the
    # heading points left of the lane tangent (world x east, z south).
    cross = lp.tangent[0] * heading[1] - lp.tangent[1] * heading[0]
    # dist > 0 = right of the lane center -> steer left (steering > 0);
    # heading left of tangent (cross < 0) -> steer right.
    steering = k_dist * lp.dist + k_head * cross
    vel = jnp.where(lp.in_lane, velocity, 0.1)
    return jnp.stack([vel, jnp.clip(steering, -1.5, 1.5)])
