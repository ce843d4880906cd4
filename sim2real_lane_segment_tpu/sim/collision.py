"""Collision detection: SAT-based oriented-bounding-box tests (reference
gym_duckietown/collision.py parity — agent_boundbox :9, tensor_sat_test
:35, safety-circle overlap helpers), vectorized over all objects in jnp.

The agent is an OBB in the ground plane; static objects are circles
(matching the renderer's cylinders).  ``proximity_penalty`` reproduces the
reference's negative safety-circle penalty that feeds the reward as
``40 * col_penalty`` (simulator.py:1339-1356).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# duckiebot footprint (m): length x width, rear-axle centered
AGENT_LENGTH = 0.18
AGENT_WIDTH = 0.12
AGENT_SAFETY_RADIUS = 0.12


def agent_corners(pos: jax.Array, angle: jax.Array) -> jax.Array:
    """(4, 2) OBB corners of the agent footprint in world (x, z)."""
    hx, hz = AGENT_LENGTH / 2, AGENT_WIDTH / 2
    local = jnp.asarray([[hx, hz], [hx, -hz], [-hx, -hz], [-hx, hz]])
    c, s = jnp.cos(angle), jnp.sin(angle)
    # world axes: x east, z south; heading = (cos a, -sin a)
    rot = jnp.asarray([[c, -s], [s, c]])
    world = local @ rot.T * jnp.asarray([1.0, -1.0])  # flip z for south axis
    return world + pos[None, :]


def _project(corners: jax.Array, axis: jax.Array):
    d = corners @ axis
    return jnp.min(d), jnp.max(d)


def sat_obb_circle(corners: jax.Array, center: jax.Array,
                   radius: jax.Array) -> jax.Array:
    """True if the OBB intersects the circle (separating-axis on box axes
    + closest-corner axis)."""
    e1 = corners[1] - corners[0]
    e2 = corners[3] - corners[0]
    axes = [e1 / (jnp.linalg.norm(e1) + 1e-9),
            e2 / (jnp.linalg.norm(e2) + 1e-9)]
    # axis to closest corner
    d = corners - center[None, :]
    closest = corners[jnp.argmin(jnp.sum(d * d, axis=1))]
    a3 = closest - center
    axes.append(a3 / (jnp.linalg.norm(a3) + 1e-9))

    def overlap(axis):
        lo, hi = _project(corners, axis)
        c = center @ axis
        return (hi >= c - radius) & (lo <= c + radius)

    hit = jnp.asarray(True)
    for a in axes:
        hit = hit & overlap(a)
    return hit


def collides_with_objects(pos: jax.Array, angle: jax.Array,
                          objects: jax.Array) -> jax.Array:
    """objects: (n, 8) rows [x, z, radius, h, r, g, b, annot] (render.py).
    Returns True if the agent OBB hits any object footprint circle."""
    corners = agent_corners(pos, angle)

    def one(obj):
        return sat_obb_circle(corners, obj[:2], obj[2])

    return jnp.any(jax.vmap(one)(objects))


def proximity_penalty(pos: jax.Array, angle: jax.Array,
                      objects: jax.Array) -> jax.Array:
    """Negative penalty growing as safety circles overlap (0 when clear).

    Matches the reference's _proximity_penalty2 semantics: penalty =
    -min(0, (d - (r_agent + r_obj)) / (r_agent + r_obj)) summed... the
    reference clips each score into [-1, 0] and sums.
    """
    heading = jnp.stack([jnp.cos(angle), -jnp.sin(angle)])
    center = pos + heading * (AGENT_LENGTH / 4)

    def one(obj):
        d = jnp.linalg.norm(center - obj[:2])
        reach = AGENT_SAFETY_RADIUS + obj[2] * 1.5
        score = (d - reach) / reach
        return jnp.clip(score, -1.0, 0.0)

    return jnp.sum(jax.vmap(one)(objects))
