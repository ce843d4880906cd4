"""Differential-drive kinematics + lane geometry (jax-first, batchable).

Reimplements the reference dynamics (simulator.py:1236-1268 update_physics,
:1750-1784 _update_pos) as pure functions over a state pytree so they jit
and vmap (batched rollouts for data generation):

  wheel velocities (vl, vr) -> body twist -> pose integration; exact
  ICC (instantaneous center of curvature) rotation when vl != vr.

Also the wheel-duty conversion of DuckietownEnv (envs/duckietown_env.py:
48-84): (velocity, steering) -> duty cycles via gain/trim/k/radius/limit.

Lane-position geometry (dot-direction + signed distance to the right-lane
center curve) mirrors get_lane_pos semantics for the reward
(simulator.py:1339-1356).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# physical constants (duckiebot)
WHEEL_DIST = 0.102        # m, baseline between wheels
ROBOT_SPEED = 1.20        # max speed scale m/s
CAMERA_HEIGHT = 0.108     # m
CAMERA_FORWARD_DIST = 0.066
CAMERA_ANGLE = 19.15      # degrees downward pitch


class AgentState(NamedTuple):
    pos: jax.Array    # (2,) world x, z  (y is up; ground plane y=0)
    angle: jax.Array  # heading, radians; 0 = +x
    vels: jax.Array   # (2,) last wheel velocities


def wheel_duty_from_action(velocity, steering, *, gain=1.0, trim=0.0,
                           radius=0.0318, k=27.0, limit=1.0,
                           wheel_dist=WHEEL_DIST):
    """DuckietownEnv action conversion (duckietown_env.py:48-84)."""
    omega_r = (velocity + 0.5 * steering * wheel_dist) / radius
    omega_l = (velocity - 0.5 * steering * wheel_dist) / radius
    k_r_inv = (gain + trim) / k
    k_l_inv = (gain - trim) / k
    u_r = jnp.clip(omega_r * k_r_inv, -limit, limit)
    u_l = jnp.clip(omega_l * k_l_inv, -limit, limit)
    return jnp.stack([u_l, u_r])


def step_pose(state: AgentState, wheel_vels: jax.Array, dt: float,
              robot_speed: float = ROBOT_SPEED,
              wheel_dist: float = WHEEL_DIST) -> AgentState:
    """Integrate one physics step (exact ICC arc, simulator.py:1750-1784)."""
    vl, vr = wheel_vels[0] * robot_speed, wheel_vels[1] * robot_speed
    straight = jnp.abs(vl - vr) < 1e-7

    # straight-line branch
    def go_straight():
        d = 0.5 * (vl + vr) * dt
        dx = d * jnp.cos(state.angle)
        dz = d * (-jnp.sin(state.angle))
        return state.pos + jnp.stack([dx, dz]), state.angle

    # arc branch around the ICC
    def go_arc():
        w = (vr - vl) / wheel_dist          # angular velocity
        r = wheel_dist / 2 * (vl + vr) / (vr - vl + 1e-12)  # signed radius
        rot = w * dt
        # ICC is perpendicular-left of heading at distance r
        cx = state.pos[0] - r * jnp.sin(state.angle)
        cz = state.pos[1] - r * jnp.cos(state.angle)
        # rotate pos around (cx, cz) by rot (note z axis points "south")
        px = state.pos[0] - cx
        pz = state.pos[1] - cz
        npx = px * jnp.cos(rot) + pz * jnp.sin(rot)
        npz = -px * jnp.sin(rot) + pz * jnp.cos(rot)
        return jnp.stack([cx + npx, cz + npz]), state.angle + rot

    pos_s, ang_s = go_straight()
    pos_a, ang_a = go_arc()
    pos = jnp.where(straight, pos_s, pos_a)
    ang = jnp.where(straight, ang_s, ang_a)
    return AgentState(pos=pos, angle=ang, vels=wheel_vels)


def heading_vec(angle):
    return jnp.stack([jnp.cos(angle), -jnp.sin(angle)])
