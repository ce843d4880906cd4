"""Collision detection: SAT-based oriented-bounding-box tests (reference
gym_duckietown/collision.py parity — agent_boundbox :9, tensor_sat_test
:35, safety-circle overlap helpers), vectorized over all objects in jnp.

The agent is an OBB in the ground plane.  Static objects carry an OBB
footprint too (half-extents + yaw in object-row columns 9:12, written by
render.build_scene from the mesh footprint) so elongated objects like the
0.5 m barrier collide with their true rotated box rather than a bounding
circle — the same OBB-vs-OBB separating-axis test the reference ran over
mesh-derived corners (collision.py:35 ``tensor_sat_test``).  Legacy
9-wide (or test 8-wide) rows degrade to a square footprint of the safety
radius.  ``proximity_penalty`` stays circle-based, reproducing the
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


def obb_corners(center: jax.Array, hx: jax.Array, hz: jax.Array,
                theta: jax.Array) -> jax.Array:
    """(4, 2) corners of an OBB footprint in world (x, z).

    ``theta`` uses the agent heading convention: world axes x east,
    z south; heading = (cos theta, -sin theta).
    """
    local = jnp.stack([jnp.stack([hx, hz]), jnp.stack([hx, -hz]),
                       jnp.stack([-hx, -hz]), jnp.stack([-hx, hz])])
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.asarray([[c, -s], [s, c]])
    world = local @ rot.T * jnp.asarray([1.0, -1.0])  # flip z for south axis
    return world + center[None, :]


def agent_corners(pos: jax.Array, angle: jax.Array) -> jax.Array:
    """(4, 2) OBB corners of the agent footprint in world (x, z)."""
    return obb_corners(pos, jnp.asarray(AGENT_LENGTH / 2),
                       jnp.asarray(AGENT_WIDTH / 2), angle)


def _project(corners: jax.Array, axis: jax.Array):
    d = corners @ axis
    return jnp.min(d), jnp.max(d)


def _edge_axes(corners: jax.Array) -> jax.Array:
    """(2, 2) unit axes normal to the box faces (= its two edge dirs)."""
    e1 = corners[1] - corners[0]
    e2 = corners[3] - corners[0]
    return jnp.stack([e1 / (jnp.linalg.norm(e1) + 1e-9),
                      e2 / (jnp.linalg.norm(e2) + 1e-9)])


def sat_obb_obb(a: jax.Array, b: jax.Array) -> jax.Array:
    """True if two (4, 2) corner sets intersect (2-D separating axis:
    the 2+2 edge normals are the only candidate separating axes)."""
    axes = jnp.concatenate([_edge_axes(a), _edge_axes(b)])

    def overlap(axis):
        alo, ahi = _project(a, axis)
        blo, bhi = _project(b, axis)
        return (ahi >= blo) & (alo <= bhi)

    return jnp.all(jax.vmap(overlap)(axes))


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


def _object_obb(obj: jax.Array) -> jax.Array:
    """(4, 2) footprint corners of one object row.

    Rows >= 12 wide carry [hx, hz, theta] at columns 9:12 (render.py);
    narrower rows (legacy/tests) fall back to a square of the safety
    radius, the pre-OBB behavior.
    """
    if obj.shape[0] >= 12:
        hx, hz, theta = obj[9], obj[10], obj[11]
    else:
        hx = hz = obj[2]
        theta = jnp.asarray(0.0)
    return obb_corners(obj[:2], hx, hz, theta)


def collides_with_objects(pos: jax.Array, angle: jax.Array,
                          objects: jax.Array) -> jax.Array:
    """objects: (n, >=8) rows [x, z, radius, h, r, g, b, annot, draw_cyl,
    hx, hz, theta] (render.py).  True if the agent OBB hits any object's
    OBB footprint."""
    corners = agent_corners(pos, angle)

    def one(obj):
        return sat_obb_obb(corners, _object_obb(obj))

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
