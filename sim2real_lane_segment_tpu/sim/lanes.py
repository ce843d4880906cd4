"""Lane geometry: signed distance + tangent of the right-lane center curve.

The reference computed lane position against Bezier control curves baked
per tile (simulator.py:847-1101, get_lane_pos2).  Our procedural tiles
use analytic curves — a straight line at u=0.75 for straight tiles and
r=0.75 arcs for curve tiles (matching textures.py geometry), so closest
point/tangent are closed-form and the whole computation jits and vmaps.

Canonical (orientation 'N') frames (right-hand traffic: the driver's
right side points toward the lane they occupy):
- straight: road along v, canonical flow -v (north), right-lane center
  u=0.75 — a north-facing driver's right is east (+u);
- curve_left: quarter annulus centered at uv (0,1), flow from the south
  edge (tangent -v) to the west edge (tangent -u), right lane r=0.75;
- curve_right: annulus centered (1,1), flow west edge -> south edge,
  right lane r=0.75.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .maps import Map

# kind codes for the jit switch
K_OTHER, K_STRAIGHT, K_CURVE_L, K_CURVE_R = 0, 1, 2, 3
LANE_R = 0.75  # right-lane center (tile units)


def kind_code(kind: str) -> int:
    return {"straight": K_STRAIGHT, "curve_left": K_CURVE_L,
            "curve_right": K_CURVE_R}.get(kind, K_OTHER)


def build_lane_arrays(m: Map):
    gh, gw = m.grid_height, m.grid_width
    code = np.zeros((gh, gw), np.int32)
    rot = np.zeros((gh, gw), np.int32)
    drivable = np.zeros((gh, gw), bool)
    from .textures import rotate_tex_index
    for j in range(gh):
        for i in range(gw):
            t = m.tiles[j][i]
            if t is None:
                continue
            code[j, i] = kind_code(t.kind)
            rot[j, i] = rotate_tex_index(t.orientation)
            drivable[j, i] = t.drivable
    return jnp.asarray(code), jnp.asarray(rot), jnp.asarray(drivable)


def _rot_uv_fwd(uv, rot):
    """Same rotation the renderer applies (render.py _rotate_uv)."""
    u, v = uv[0], uv[1]
    u1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [u, v, 1 - u, 1 - v])
    v1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [v, 1 - u, 1 - v, u])
    return jnp.stack([u1, v1])


def _rot_dir_bwd(d, rot):
    """Map a canonical-frame direction back to the tile frame (inverse of
    the uv rotation's Jacobian)."""
    du, dv = d[0], d[1]
    # forward jacobians: rot0:(u,v); rot1:(v,1-u): d->(dv,-du);
    # rot2: (-du,-dv); rot3: (1-v,u): d->(-dv,du)
    # inverse of each:
    u1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [du, -dv, -du, dv])
    v1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [dv, du, -dv, -du])
    return jnp.stack([u1, v1])


class LanePos(NamedTuple):
    dist: jax.Array      # signed distance (tile units) to right-lane center
    dot_dir: jax.Array   # heading · lane tangent
    in_lane: jax.Array   # bool — on a drivable tile with known lane geometry
    tangent: jax.Array   # (2,) world-frame (x, z) unit tangent


def lane_pos(lane_arrays, tile_size: float, pos: jax.Array,
             angle: jax.Array) -> LanePos:
    code_g, rot_g, drivable_g = lane_arrays
    gh, gw = code_g.shape
    ti = jnp.floor(pos[0] / tile_size).astype(jnp.int32)
    tj = jnp.floor(pos[1] / tile_size).astype(jnp.int32)
    in_grid = (ti >= 0) & (ti < gw) & (tj >= 0) & (tj < gh)
    tic = jnp.clip(ti, 0, gw - 1)
    tjc = jnp.clip(tj, 0, gh - 1)
    code = code_g[tjc, tic]
    rot = rot_g[tjc, tic]
    drivable = drivable_g[tjc, tic] & in_grid

    uv = jnp.stack([pos[0] / tile_size - ti.astype(jnp.float32),
                    pos[1] / tile_size - tj.astype(jnp.float32)])
    cuv = _rot_uv_fwd(uv, rot)

    def straight(cuv):
        dist = cuv[0] - LANE_R
        tangent = jnp.asarray([0.0, -1.0])
        return dist, tangent

    def curve(cuv, cu, cv, sign):
        e = cuv - jnp.asarray([cu, cv])
        r = jnp.linalg.norm(e) + 1e-9
        er = e / r
        dist = (r - LANE_R) * sign
        # curve_left (center SW): tangent = (e_v, -e_u); curve_right
        # (center SE): tangent = (-e_v, e_u)
        tangent = jnp.stack([er[1], -er[0]]) * sign
        return dist, tangent

    dist_s, tan_s = straight(cuv)
    dist_l, tan_l = curve(cuv, 0.0, 1.0, 1.0)
    dist_r, tan_r = curve(cuv, 1.0, 1.0, -1.0)

    known = code != K_OTHER
    dist = jnp.select([code == K_STRAIGHT, code == K_CURVE_L, code == K_CURVE_R],
                      [dist_s, dist_l, dist_r], 0.0)
    tangent_c = jnp.select([code == K_STRAIGHT, code == K_CURVE_L, code == K_CURVE_R],
                           [tan_s, tan_l, tan_r], jnp.asarray([0.0, 1.0]))
    tangent_uv = _rot_dir_bwd(tangent_c, rot)
    # world: +u == +x, +v == +z
    heading = jnp.stack([jnp.cos(angle), -jnp.sin(angle)])
    dot_dir = heading[0] * tangent_uv[0] + heading[1] * tangent_uv[1]
    return LanePos(dist=dist, dot_dir=dot_dir, in_lane=drivable & known,
                   tangent=tangent_uv)
