"""Procedural tile shading — gather-free texturing for the renderer.

The atlas path (textures.py + a bilinear gather per pixel) measured only
~37 pair-frames/s at 480x640 on a v5e: per-pixel gathers from a texture
atlas are scatter/gather ops the TPU executes scalar-ish.  But our
textures are *procedural* — lane lines, dashes and annotation colors are
closed-form functions of the in-tile uv — so the shader can compute the
texel color directly with VPU math (selects, abs, mod) and an integer
hash for asphalt noise.  No memory indirection at all.

Shares its geometry constants with textures.py so the atlas and
procedural paths agree on where lanes/lines are, and the label extractor
(ops/labelgen.py) decodes procedural annotated pairs identically.

Tile codes (SHADE_*): the scene builder maps tile kinds to small ints;
rotation handling mirrors render._rotate_uv.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .textures import (ANNOT_LEFT, ANNOT_RIGHT, CENTER_LINE_W, CORNER_ZONE,
                       DASH_DUTY, DASH_PERIOD, EDGE_LINE_POS, EDGE_LINE_W,
                       FLOOR, GRASS, ROAD, ROAD_NOISE, WHITE, YELLOW)

(S_ASPHALT, S_GRASS, S_FLOOR, S_STRAIGHT, S_CURVE_L, S_CURVE_R, S_3WAY,
 S_4WAY) = 0, 1, 2, 3, 4, 5, 6, 7

KIND_TO_SHADE = {
    "asphalt": S_ASPHALT, "grass": S_GRASS, "floor": S_FLOOR,
    "straight": S_STRAIGHT, "curve_left": S_CURVE_L,
    "curve_right": S_CURVE_R,
    # 3way_right shares 3way_left's canonical geometry — the reference
    # gives both the same curve set (simulator.py:909 kind.startswith)
    "3way_left": S_3WAY, "3way_right": S_3WAY, "4way": S_4WAY,
}


def _hash_noise(ix, iy, amplitude: float):
    """Deterministic per-texel noise in [-amplitude, amplitude] from an
    integer hash (pure VPU: mul/xor/shift)."""
    h = ix * jnp.int32(73856093) ^ iy * jnp.int32(19349663)
    h = h ^ (h >> 13)
    h = h * jnp.int32(1274126177)
    h = h ^ (h >> 16)
    u = (h & jnp.int32(0xFFFF)).astype(jnp.float32) / 65535.0  # [0, 1]
    return (u * 2.0 - 1.0) * amplitude


def shade(code: jax.Array, cuv: jax.Array, annotated: bool) -> jax.Array:
    """Per-pixel tile color.

    Args:
      code: (H, W) int32 shade codes.
      cuv:  (H, W, 2) canonical (orientation-corrected) in-tile uv.
    Returns: (H, W, 3) float32 RGB in [0, 255].
    """
    u, v = cuv[..., 0], cuv[..., 1]

    # per-texel asphalt/grass noise on a virtual 256-texel grid
    ix = jnp.floor(u * 256.0).astype(jnp.int32)
    iy = jnp.floor(v * 256.0).astype(jnp.int32)
    noise = _hash_noise(ix, iy, 1.0)

    asphalt = jnp.asarray(ROAD, jnp.float32) + noise[..., None] * ROAD_NOISE
    grass = jnp.asarray(GRASS, jnp.float32) + noise[..., None] * 10.0
    floor = jnp.broadcast_to(jnp.asarray(FLOOR, jnp.float32), asphalt.shape)

    # ---- straight geometry (canonical: road along v, center at u=0.5)
    white_s = ((jnp.abs(u - EDGE_LINE_POS - EDGE_LINE_W / 2) < EDGE_LINE_W / 2) |
               (jnp.abs(u - (1 - EDGE_LINE_POS - EDGE_LINE_W / 2)) < EDGE_LINE_W / 2))
    dash_s = (v % DASH_PERIOD) < DASH_PERIOD * DASH_DUTY
    yellow_s = (jnp.abs(u - 0.5) < CENTER_LINE_W / 2) & dash_s
    right_s = u > 0.5

    # ---- curve geometry (annulus around a corner); the canonical right
    # lane is the OUTER half on curve_left, the INNER half on curve_right
    # (textures.curve_masks)
    def curve(cu, cv, right_outer):
        r = jnp.hypot(u - cu, v - cv)
        road = (r > 0.0) & (r < 1.0)
        white = ((jnp.abs(r - EDGE_LINE_POS - EDGE_LINE_W / 2) < EDGE_LINE_W / 2) |
                 (jnp.abs(r - (1 - EDGE_LINE_POS - EDGE_LINE_W / 2)) < EDGE_LINE_W / 2))
        theta = jnp.arctan2(v - cv, u - cu)
        dash = (jnp.abs(theta) % 0.4) < 0.2
        yellow = (jnp.abs(r - 0.5) < CENTER_LINE_W / 2) & dash
        right = (r > 0.5) if right_outer else (r < 0.5)
        return road, white, yellow, right

    road_l, white_l, yellow_l, right_l = curve(0.0, 1.0, True)
    road_r, white_r, yellow_r, right_r = curve(1.0, 1.0, False)

    # ---- intersection geometry (textures.intersection_masks, jnp mirror).
    # Annotated == base: the reference has no _cv textures for 3way/4way
    # (falls back to the base texture -> background labels, QUIRKS.md).
    def edge_band(x, p):
        return jnp.abs(x - p - EDGE_LINE_W / 2) < EDGE_LINE_W / 2

    zone_v = (v < CORNER_ZONE) | (v > 1 - CORNER_ZONE)
    zone_u = (u < CORNER_ZONE) | (u > 1 - CORNER_ZONE)
    w_line = edge_band(u, EDGE_LINE_POS)
    e_line = edge_band(u, 1 - EDGE_LINE_POS - EDGE_LINE_W)
    n_line = edge_band(v, EDGE_LINE_POS)
    s_line = edge_band(v, 1 - EDGE_LINE_POS - EDGE_LINE_W)
    white_4w = ((w_line | e_line) & zone_v) | ((n_line | s_line) & zone_u)
    white_3w = (e_line | (w_line & zone_v)
                | ((n_line | s_line) & (u < CORNER_ZONE)))
    yellow_3w = (jnp.abs(u - 0.5) < CENTER_LINE_W / 2) & dash_s & zone_v

    def inter_color(white, yellow):
        c = jnp.where(white[..., None], jnp.asarray(WHITE, jnp.float32),
                      asphalt)
        return jnp.where(yellow[..., None], jnp.asarray(YELLOW, jnp.float32),
                         c)

    def road_color(white, yellow, right, road):
        if annotated:
            lane = jnp.where(right[..., None],
                             jnp.asarray(ANNOT_RIGHT, jnp.float32),
                             jnp.asarray(ANNOT_LEFT, jnp.float32))
            c = jnp.where(road[..., None], lane, grass)
        else:
            c = jnp.where((white & road)[..., None],
                          jnp.asarray(WHITE, jnp.float32), asphalt)
            c = jnp.where((yellow & road)[..., None],
                          jnp.asarray(YELLOW, jnp.float32), c)
            c = jnp.where(road[..., None], c, grass)
        return c

    all_road = jnp.ones_like(right_s)
    straight_c = road_color(white_s, yellow_s, right_s, all_road)
    curve_l_c = road_color(white_l, yellow_l, right_l, road_l)
    curve_r_c = road_color(white_r, yellow_r, right_r, road_r)
    inter_3w = inter_color(white_3w, yellow_3w)
    inter_4w = inter_color(white_4w, jnp.zeros_like(yellow_3w))

    code_e = code[..., None]
    out = jnp.where(code_e == S_GRASS, grass, asphalt)
    out = jnp.where(code_e == S_FLOOR, floor, out)
    out = jnp.where(code_e == S_STRAIGHT, straight_c, out)
    out = jnp.where(code_e == S_CURVE_L, curve_l_c, out)
    out = jnp.where(code_e == S_CURVE_R, curve_r_c, out)
    out = jnp.where(code_e == S_3WAY, inter_3w, out)
    out = jnp.where(code_e == S_4WAY, inter_4w, out)
    return out


def build_shade_arrays(m) -> tuple[np.ndarray, np.ndarray]:
    """(shade_code, rot) (gh, gw) int32 arrays for a Map."""
    from .textures import rotate_tex_index
    gh, gw = m.grid_height, m.grid_width
    code = np.zeros((gh, gw), np.int32)
    rot = np.zeros((gh, gw), np.int32)
    for j in range(gh):
        for i in range(gw):
            t = m.tiles[j][i]
            if t is None:
                code[j, i] = S_FLOOR
            else:
                code[j, i] = KIND_TO_SHADE.get(t.kind, S_ASPHALT)
                rot[j, i] = rotate_tex_index(t.orientation)
    return code, rot
