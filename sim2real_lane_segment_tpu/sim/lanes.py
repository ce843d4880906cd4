"""Lane geometry: signed distance + tangent of the lane-center curve.

The reference baked Bezier control curves per tile — 2 for straights and
curves, 6 for 3-way and 12 for 4-way intersections — and picked the
curve whose chord best aligns with the agent heading (argmax of
chord · dir, simulator.py:847-1101 `_get_curve` / `closest_curve_point`).

Here each tile kind carries an analytic *curve-primitive table* instead:
lane centers are straight lines (u = 0.25/0.75) or quarter arcs around a
tile corner (r = 0.25 inner / 0.75 outer), so closest point, signed
distance and tangent are closed-form and the whole computation jits and
vmaps — no Bezier iteration.  Selection reproduces the reference rule
*including its quirk*: reference chords are effectively unnormalized
(a single scalar norm divides all of them, simulator.py:1043), which
biases selection toward through-lanes and against small-radius right
turns; we store true chord vectors so the behavior matches.

Canonical frames (rot 0 == orientation 'N', flow north; right-hand
traffic — a north-facing driver's lane center is u=0.75):
- straight: road along v; northbound u=0.75, southbound u=0.25;
- curve_left: quarter annulus around corner (0,1): S-edge<->W-edge;
- curve_right: quarter annulus around corner (1,1): S-edge<->E-edge;
- 3way (both `3way_left` and `3way_right` — the reference gives them the
  same curves, QUIRKS.md): N-S through road + branch WEST;
- 4way: through roads both axes + all four corner turn arcs.

Arc sign convention: s=+1 for left-turning flow, s=-1 for right-turning;
dist = (r - r_lane) * s is then positive to the driver's right for every
primitive, matching the straight-line convention dist = u - 0.75.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .maps import Map

# kind codes for the jit switch
K_OTHER, K_STRAIGHT, K_CURVE_L, K_CURVE_R, K_3WAY, K_4WAY = 0, 1, 2, 3, 4, 5
LANE_R = 0.75  # right-lane center (tile units)
MAX_CURVES = 12

_KIND_CODES = {"straight": K_STRAIGHT, "curve_left": K_CURVE_L,
               "curve_right": K_CURVE_R, "3way_left": K_3WAY,
               "3way_right": K_3WAY, "4way": K_4WAY}


def kind_code(kind: str) -> int:
    return _KIND_CODES.get(kind, K_OTHER)


# ---------------------------------------------------------------------------
# curve-primitive tables
# ---------------------------------------------------------------------------
# primitive row: [is_arc, a0, a1, d0, d1, r_lane, s, sel0, sel1, valid]
#   line: point (a0, a1) on the lane center, unit direction (d0, d1)
#   arc:  corner center (a0, a1), lane radius r_lane, turn sign s
#   (sel0, sel1): the curve's chord vector — selection heading, kept
#   unnormalized to reproduce the reference's selection bias.
N_FIELDS = 10


def _line(u_or_v: float, axis: str, sgn: float) -> list[float]:
    """Lane-center line along ``axis`` ('v' = north-south road)."""
    if axis == "v":   # road along v, lane at u=const, direction (0, sgn)
        p, d = (u_or_v, 0.5), (0.0, sgn)
    else:             # road along u, lane at v=const, direction (sgn, 0)
        p, d = (0.5, u_or_v), (sgn, 0.0)
    return [0.0, p[0], p[1], d[0], d[1], 0.0, 0.0, d[0], d[1], 1.0]


def _arc(cu: float, cv: float, r: float, s: float) -> list[float]:
    """Quarter arc around tile corner (cu, cv), lane radius r, turn sign s."""
    # endpoints lie on the two tile edges adjoining the corner
    ex = np.array([np.sign(0.5 - cu), 0.0])
    ez = np.array([0.0, np.sign(0.5 - cv)])
    p1 = np.array([cu, cv]) + r * ex
    p2 = np.array([cu, cv]) + r * ez
    # tangent at the arc midpoint fixes the chord direction for flow s
    m = (ex + ez) / np.sqrt(2.0)
    tan_mid = s * np.array([m[1], -m[0]])
    chord = p2 - p1
    if float(chord @ tan_mid) < 0:
        chord = -chord
    return [1.0, cu, cv, 0.0, 0.0, r, s, float(chord[0]), float(chord[1]), 1.0]


def _pad(rows: list[list[float]]) -> np.ndarray:
    out = np.zeros((MAX_CURVES, N_FIELDS), np.float32)
    if rows:
        out[:len(rows)] = np.asarray(rows, np.float32)
    return out


def _build_prim_table() -> np.ndarray:
    ns_lines = [_line(0.75, "v", -1.0), _line(0.25, "v", +1.0)]
    ew_lines = [_line(0.75, "u", +1.0), _line(0.25, "u", -1.0)]

    def corner_turns(cu, cv):
        return [_arc(cu, cv, 0.25, -1.0), _arc(cu, cv, 0.75, +1.0)]

    tables = {
        K_OTHER: [],
        K_STRAIGHT: ns_lines,
        # curve tiles: the canonical direction's right lane is the OUTER
        # r=0.75 arc on curve_left (a left turn) and the INNER r=0.25 arc
        # on curve_right (a right turn hugs its corner) — confirmed by the
        # reference's Bezier points (simulator.py:875-907) and the green
        # region of its curve_*_cv annotated textures
        K_CURVE_L: [_arc(0.0, 1.0, 0.75, +1.0), _arc(0.0, 1.0, 0.25, -1.0)],
        K_CURVE_R: [_arc(1.0, 1.0, 0.25, -1.0), _arc(1.0, 1.0, 0.75, +1.0)],
        # 3way canonical: N-S through + branch west (turns at west corners)
        K_3WAY: ns_lines + corner_turns(0.0, 0.0) + corner_turns(0.0, 1.0),
        K_4WAY: ns_lines + ew_lines + corner_turns(0.0, 0.0)
                + corner_turns(1.0, 0.0) + corner_turns(0.0, 1.0)
                + corner_turns(1.0, 1.0),
    }
    n_kinds = max(tables) + 1
    return np.stack([_pad(tables[k]) for k in range(n_kinds)])


PRIM_TABLE = _build_prim_table()   # (n_kinds, MAX_CURVES, N_FIELDS)


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


def _rot_dir_fwd(d, rot):
    """Map a tile-frame direction into the canonical frame (the uv
    rotation's Jacobian)."""
    du, dv = d[0], d[1]
    # forward jacobians: rot0:(u,v); rot1:(v,1-u): d->(dv,-du);
    # rot2: (-du,-dv); rot3: (1-v,u): d->(-dv,du)
    u1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [du, dv, -du, -dv])
    v1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [dv, -du, -dv, du])
    return jnp.stack([u1, v1])


def _rot_dir_bwd(d, rot):
    """Map a canonical-frame direction back to the tile frame (inverse)."""
    du, dv = d[0], d[1]
    u1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [du, -dv, -du, dv])
    v1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [dv, du, -dv, -du])
    return jnp.stack([u1, v1])


class LanePos(NamedTuple):
    dist: jax.Array      # signed distance (tile units) to the lane center
    dot_dir: jax.Array   # heading · lane tangent
    in_lane: jax.Array   # bool — on a drivable tile with known lane geometry
    tangent: jax.Array   # (2,) world-frame (x, z) unit tangent
    curvature: jax.Array  # signed lane curvature, 1/m (+ = left turn)


def lane_pos(lane_arrays, tile_size: float, pos: jax.Array,
             angle: jax.Array) -> LanePos:
    """Lane position via the reference's curve-selection rule: among the
    tile's curve primitives, pick argmax(chord · heading), then return the
    signed distance/tangent of the closest point on that curve."""
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

    # world: +u == +x, +v == +z; heading 0 looks along +x
    heading = jnp.stack([jnp.cos(angle), -jnp.sin(angle)])
    h_c = _rot_dir_fwd(heading, rot)

    prim = jnp.asarray(PRIM_TABLE)[code]          # (MAX_CURVES, N_FIELDS)
    is_arc = prim[:, 0]
    a = prim[:, 1:3]
    d = prim[:, 3:5]
    r_lane = prim[:, 5]
    s = prim[:, 6]
    sel = prim[:, 7:9]
    valid = prim[:, 9] > 0.5

    # line: dist = (uv - p) · right_of(d); right_of((du,dv)) = (-dv, du)
    rel = cuv[None, :] - a                        # (MAX_CURVES, 2)
    dist_line = rel[:, 0] * (-d[:, 1]) + rel[:, 1] * d[:, 0]
    # arc: e = uv - c
    r = jnp.sqrt(rel[:, 0] ** 2 + rel[:, 1] ** 2) + 1e-9
    dist_arc = (r - r_lane) * s
    tan_arc = jnp.stack([rel[:, 1], -rel[:, 0]], axis=-1) * (s / r)[:, None]

    dists = jnp.where(is_arc > 0.5, dist_arc, dist_line)
    tangents = jnp.where((is_arc > 0.5)[:, None], tan_arc, d)

    scores = sel[:, 0] * h_c[0] + sel[:, 1] * h_c[1]
    scores = jnp.where(valid, scores, -1e9)
    idx = jnp.argmax(scores)

    known = code != K_OTHER
    dist = jnp.where(known, dists[idx], 0.0)
    tangent_c = jnp.where(known, tangents[idx], jnp.asarray([0.0, 1.0]))
    tangent_uv = _rot_dir_bwd(tangent_c, rot)
    dot_dir = heading[0] * tangent_uv[0] + heading[1] * tangent_uv[1]
    # signed world curvature of the selected primitive (arcs only);
    # rotations preserve handedness so no per-rot sign flip is needed
    curv = jnp.where(known & (is_arc[idx] > 0.5),
                     s[idx] / (r_lane[idx] * tile_size + 1e-9), 0.0)
    return LanePos(dist=dist, dot_dir=dot_dir, in_lane=drivable & known,
                   tangent=tangent_uv, curvature=curv)
