"""JAX ray-cast renderer for the tile world — the OpenGL replacement.

The reference rendered with pyglet fixed-function OpenGL into an FBO and
read pixels back (simulator.py:1403-1614).  Here a camera frame is one
jitted gather pipeline, batchable over poses (vmap) and frames:

  pixel grid -> pinhole rays (pitch + heading rotation)
             -> ground-plane intersection (y=0)
             -> tile index + in-tile UV (orientation-rotated)
             -> texture-atlas bilinear gather (base or annotated slot)
             -> objects composited by ray-cylinder/billboard depth test
             -> lighting scale + camera noise (domain randomization).

Pixel-aligned (normal, annotated) pairs are structural: both variants use
the SAME rays and DR parameters, only the atlas slot offset differs — the
reference needed the `_perturb(use_last_noise=True)` replay hack for this
(simulator.py:759-781, 1616-1635).

The fisheye distortion (distortion.py in the reference, an O(H*W) python
loop at init) becomes a one-time remap of the pixel->ray grid.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .maps import Map
from .textures import RES, TILE_KINDS, build_atlas, rotate_tex_index, \
    ANNOT_OBSTACLE
from .physics import CAMERA_ANGLE, CAMERA_FORWARD_DIST, CAMERA_HEIGHT

CAMERA_FOV_Y = 75.0  # vertical field of view, degrees
SKY_TOP = np.array([90, 160, 220], np.float32)
SKY_HORIZON = np.array([180, 210, 235], np.float32)

# horizon variants selected by DR ``horz_mode`` (simulator.py:385-396:
# blue sky / wall color / dark grey / near-white — grey and white are
# sampled deliberately because they confuse road/lane-marking colors).
# (sky top, sky horizon) pairs; mode 0 == legacy blue.
HORZ_MODES_TOP = np.array([
    [90, 160, 220], [165, 150, 110], [35, 35, 38], [225, 225, 225],
], np.float32)
HORZ_MODES_HORIZON = np.array([
    [180, 210, 235], [200, 185, 145], [55, 55, 58], [238, 238, 238],
], np.float32)

# lighting model: far positional light (reference GL_LIGHT0 position was
# sampled in huge units, randomization config light_pos) -> effectively
# directional; lambert on the surface normal with a fixed ambient floor.
# Normalized so the DEFAULT light position renders at intensity 1.0
# (keeps un-randomized frames identical to pre-lighting renders).
LIGHT_AMBIENT = 0.35
LIGHT_DIFFUSE = 0.65
DEFAULT_LIGHT_POS = np.array([-40.0, 200.0, 100.0], np.float32)
_LIGHT_NORM = LIGHT_AMBIENT + LIGHT_DIFFUSE * (
    DEFAULT_LIGHT_POS[1] / np.linalg.norm(DEFAULT_LIGHT_POS))


class SceneArrays(NamedTuple):
    """Static device arrays describing one map."""
    atlas: jax.Array        # (n_slots, RES, RES, 3) uint8
    tile_slot: jax.Array    # (gh, gw) int32 — base atlas slot per tile
    tile_rot: jax.Array     # (gh, gw) int32 — number of 90° uv rotations
    shade_code: jax.Array   # (gh, gw) int32 — procedural shading codes
    tile_size: float
    grid_hw: tuple[int, int]
    # objects: (x, z, radius, h, r, g, b, annotated, draw_cyl,
    #           hx, hz, theta) — cols 0:9 drive the cylinder compositor,
    #           cols 9:12 are the OBB collision footprint (collision.py)
    objects: jax.Array      # (n_obj, 12) float32 (inert row when none)
    meshes: "MeshSet"       # packed OBJ/box triangles (objmesh.py)


OBJECT_COLORS = {
    "duckie": (240, 215, 50),
    "duckiebot": (60, 60, 170),
    "cone": (230, 120, 40),
    "barrier": (200, 50, 40),
    "sign": (180, 180, 180),
    "tree": (30, 110, 40),
    "building": (160, 140, 120),
    "house": (160, 140, 120),
    "truck": (120, 120, 130),
    "bus": (200, 180, 60),
}
OBJECT_RADII = {"duckie": 0.06, "duckiebot": 0.08, "cone": 0.05,
                "barrier": 0.15, "tree": 0.2, "building": 0.4}
# kinds rendered as box meshes (reference loaded OBJ meshes for these;
# map objects may also specify an explicit ``mesh: path.obj``)
MESH_KINDS = {"duckiebot": (0.13, 0.12, 0.18), "barrier": (0.5, 0.12, 0.1),
              "building": (0.6, 0.5, 0.6), "house": (0.6, 0.4, 0.6),
              "truck": (0.2, 0.2, 0.5), "bus": (0.2, 0.25, 0.6),
              "sign": (0.12, 0.25, 0.02)}


def build_scene(m: Map, seed: int = 0, with_layout: bool = False,
                texture_pack: str | None = None):
    """Build the device scene; with_layout additionally returns
    {object index: (first_triangle, n_triangles, mesh, rotate_deg)} so
    dynamic objects (NPC duckiebots) can re-place their mesh triangles
    each step.  ``texture_pack`` loads photographic tile textures
    (reference graphics.py:25-65 file layout) into the atlas instead of
    the procedural ones — consumed by the atlas render path
    (render_frame(procedural=False))."""
    if texture_pack is not None:
        from .textures import build_atlas_from_pack
        atlas_np, kind_index = build_atlas_from_pack(texture_pack, seed)
    else:
        atlas_np, kind_index = build_atlas(seed)
    gh, gw = m.grid_height, m.grid_width
    slot = np.zeros((gh, gw), np.int32)
    rot = np.zeros((gh, gw), np.int32)
    for j in range(gh):
        for i in range(gw):
            t = m.tiles[j][i]
            if t is None:
                slot[j, i] = kind_index["floor"]
            else:
                kind = t.kind if t.kind in kind_index else "asphalt"
                slot[j, i] = kind_index[kind]
                rot[j, i] = rotate_tex_index(t.orientation)
    from .objmesh import (MeshSet, load_obj, make_box_mesh,
                          make_duckiebot_mesh, place_mesh)
    objs = []
    mesh_instances = []
    layout = {}
    tri_count = 0
    for oi, o in enumerate(m.objects):
        # all sign_* variants (sign_stop, sign_T_intersect, ...) share the
        # generic sign geometry/color
        okind = "sign" if o.kind.startswith("sign") else o.kind
        color = OBJECT_COLORS.get(okind, (150, 150, 150))
        radius = OBJECT_RADII.get(okind, 0.08)
        # duckies/bots/cones on drivable tiles are "obstacles" — their
        # annotated render is pure red (postprocess_v2 r>0 rule)
        annotated = 1.0 if o.kind in ("duckie", "duckiebot", "cone") else 0.0
        pos_world = (o.pos[0] * m.tile_size, o.pos[1] * m.tile_size)
        mesh_path = getattr(o, "mesh", None)
        mesh = None
        if mesh_path:
            mesh = load_obj(mesh_path)
        elif okind == "duckiebot":
            # UV-textured skin + annotated texture swap (the reference's
            # duckiebot_cv mesh, objmesh.py:289-302)
            mesh = make_duckiebot_mesh()
        elif okind in MESH_KINDS:
            sx, sy, sz = MESH_KINDS[okind]
            sy = o.height or sy
            mesh = make_box_mesh(sx, sy, sz, color)
        draw_cyl = 0.0 if mesh is not None else 1.0
        # OBB collision footprint: mesh kinds use their true (sx, sz)
        # footprint so long objects (the 0.5 m barrier) collide as
        # rotated boxes; cylinder kinds degrade to a square of radius
        if okind in MESH_KINDS:
            hx, hz = MESH_KINDS[okind][0] / 2, MESH_KINDS[okind][2] / 2
        else:
            hx = hz = radius
        theta = float(np.radians(o.rotate))
        objs.append([*pos_world, radius, o.height, *color, annotated,
                     draw_cyl, hx, hz, theta])
        if mesh is not None:
            mesh_instances.append((place_mesh(mesh, pos_world, o.rotate),
                                   mesh, annotated))
            layout[oi] = (tri_count, mesh.num_triangles, mesh, o.rotate)
            tri_count += mesh.num_triangles
    if not objs:
        objs = [[1e9, 1e9, 0.0, 0.0, 0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0]]
    from .shading import build_shade_arrays
    shade_code, _ = build_shade_arrays(m)
    scene = SceneArrays(
        atlas=jnp.asarray(atlas_np),
        tile_slot=jnp.asarray(slot),
        tile_rot=jnp.asarray(rot),
        shade_code=jnp.asarray(shade_code),
        tile_size=m.tile_size,
        grid_hw=(gh, gw),
        objects=jnp.asarray(np.asarray(objs, np.float32)),
        meshes=MeshSet.build(mesh_instances))
    return (scene, layout) if with_layout else scene


# ---------------------------------------------------------------------------
# rays
# ---------------------------------------------------------------------------

def make_ray_grid(height: int, width: int, fov_y: float = CAMERA_FOV_Y,
                  distortion: bool = False) -> np.ndarray:
    """(H, W, 3) camera-frame ray directions (x right, y up, z forward).

    With ``distortion`` the grid comes from the RasPi plumb-bob
    calibration the reference used (sim/distortion.py): rays are bent
    once at build time, so distorted rendering costs nothing per frame.
    """
    if distortion:
        from .distortion import distorted_ray_grid
        return distorted_ray_grid(height, width)
    aspect = width / height
    tan_y = np.tan(np.radians(fov_y) / 2)
    ys = np.linspace(1, -1, height) * tan_y
    xs = np.linspace(-1, 1, width) * tan_y * aspect
    xx, yy = np.meshgrid(xs, ys)
    dirs = np.stack([xx, yy, np.ones_like(xx)], axis=-1)
    return (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)).astype(np.float32)


def rotate_rays(rays: jax.Array, pitch_deg: float, heading: jax.Array) -> jax.Array:
    """Apply downward pitch then yaw(heading) to camera rays -> world frame.

    World frame: x east, y up, z south; heading 0 looks along +x.
    """
    p = jnp.radians(pitch_deg)
    cy, sy = jnp.cos(p), jnp.sin(p)
    x, y, z = rays[..., 0], rays[..., 1], rays[..., 2]
    # pitch down about the camera x-axis
    y2 = y * cy - z * sy
    z2 = y * sy + z * cy
    # yaw: camera +z (forward) maps to heading direction (cos a, 0, -sin a)
    ca, sa = jnp.cos(heading), jnp.sin(heading)
    wx = z2 * ca + x * sa
    wz = -z2 * sa + x * ca
    return jnp.stack([wx, y2, wz], axis=-1)


# ---------------------------------------------------------------------------
# shading
# ---------------------------------------------------------------------------

def _sample_atlas(atlas, slot, uv):
    """Bilinear gather: slot (H,W) int32, uv (H,W,2) in [0,1)."""
    f = uv * (RES - 1)
    x0 = jnp.floor(f).astype(jnp.int32)
    frac = f - x0
    x1 = jnp.minimum(x0 + 1, RES - 1)

    def g(iy, ix):
        return atlas[slot, iy, ix].astype(jnp.float32)

    c00 = g(x0[..., 1], x0[..., 0])
    c10 = g(x0[..., 1], x1[..., 0])
    c01 = g(x1[..., 1], x0[..., 0])
    c11 = g(x1[..., 1], x1[..., 0])
    wx = frac[..., 0:1]
    wy = frac[..., 1:2]
    return (c00 * (1 - wx) * (1 - wy) + c10 * wx * (1 - wy) +
            c01 * (1 - wx) * wy + c11 * wx * wy)


def _rotate_uv(uv, rot):
    """Rotate in-tile uv by rot*90° CCW (rot in {0,1,2,3})."""
    u, v = uv[..., 0], uv[..., 1]
    u1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [u, v, 1 - u, 1 - v])
    v1 = jnp.select([rot == 0, rot == 1, rot == 2, rot == 3],
                    [v, 1 - u, 1 - v, u])
    return jnp.stack([u1, v1], axis=-1)


class DRParams(NamedTuple):
    """Domain-randomization parameters, drawn by sim.randomization.Randomizer
    (the reference's JSON-config DR, randomization/randomizer.py:22-72)."""
    light_rgb: jax.Array      # (3,) per-channel light scale
    noise_sigma: jax.Array    # camera gaussian noise sigma (uint8 units)
    horizon_shift: jax.Array  # sky color shift
    light_pos: jax.Array      # (3,) world light position (far -> directional)
    horz_mode: jax.Array      # () int32 horizon/sky variant
    frame_skip: jax.Array     # () int32 physics substeps (consumed by env)

    @staticmethod
    def default():
        return DRParams(jnp.ones(3), jnp.zeros(()), jnp.zeros(()),
                        jnp.asarray(DEFAULT_LIGHT_POS),
                        jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32))

    @staticmethod
    def sample(key, randomizer=None):
        """Draw one episode's params from a Randomizer (default: the
        reference-schema default_dr config)."""
        from .randomization import Randomizer
        r = randomizer if randomizer is not None else Randomizer()
        return DRParams.from_draws(r.randomize(key))

    @staticmethod
    def from_draws(d: dict) -> "DRParams":
        """Build from a Randomizer.randomize()/defaults() draw dict;
        missing keys fall back to the un-randomized defaults."""
        base = DRParams.default()
        get = lambda k, dflt: jnp.asarray(d[k]) if k in d else dflt
        return DRParams(
            light_rgb=jnp.broadcast_to(
                get("light_scale", base.light_rgb).astype(jnp.float32), (3,)),
            noise_sigma=get("camera_noise", base.noise_sigma)
                .astype(jnp.float32).reshape(()),
            horizon_shift=get("horizon_shift", base.horizon_shift)
                .astype(jnp.float32).reshape(()),
            light_pos=jnp.broadcast_to(
                get("light_pos", base.light_pos).astype(jnp.float32), (3,)),
            horz_mode=(get("horz_mode", base.horz_mode)
                       .astype(jnp.int32).reshape(())
                       % HORZ_MODES_TOP.shape[0]),
            frame_skip=jnp.maximum(
                get("frame_skip", base.frame_skip)
                .astype(jnp.int32).reshape(()), 1))


def _grid_lookup(values: jax.Array, tjc: jax.Array, tic: jax.Array):
    """Gather-free (H, W) lookup into a small (gh, gw) grid via one-hot
    matmul (TPU gathers are slow; a <=few-hundred-wide compare+matmul is
    microseconds on the VPU/MXU)."""
    gh, gw = values.shape
    flat_idx = tjc * gw + tic                       # (H, W)
    n = gh * gw
    onehot = (flat_idx[..., None] ==
              jnp.arange(n, dtype=flat_idx.dtype)).astype(jnp.float32)
    out = onehot @ values.reshape(n).astype(jnp.float32)
    return out


@functools.partial(jax.jit, static_argnames=("height", "width", "annotated",
                                             "distortion", "procedural"))
def render_frame(scene: SceneArrays, pos: jax.Array, angle: jax.Array,
                 dr: DRParams, noise_key: jax.Array, *,
                 height: int = 480, width: int = 640,
                 annotated: bool = False, distortion: bool = False,
                 procedural: bool = True) -> jax.Array:
    """Render one (height, width, 3) uint8 RGB frame."""
    rays_cam = jnp.asarray(make_ray_grid(height, width, distortion=distortion))
    rays = rotate_rays(rays_cam, -CAMERA_ANGLE, angle)

    cam_pos = jnp.stack([
        pos[0] + CAMERA_FORWARD_DIST * jnp.cos(angle),
        jnp.asarray(CAMERA_HEIGHT, jnp.float32),
        pos[1] - CAMERA_FORWARD_DIST * jnp.sin(angle)])

    dy = rays[..., 1]
    hits_ground = dy < -1e-5
    t = jnp.where(hits_ground, -cam_pos[1] / jnp.where(hits_ground, dy, -1.0), jnp.inf)
    hx = cam_pos[0] + t * rays[..., 0]
    hz = cam_pos[2] + t * rays[..., 2]

    ts = scene.tile_size
    gh, gw = scene.grid_hw
    ti = jnp.floor(hx / ts).astype(jnp.int32)
    tj = jnp.floor(hz / ts).astype(jnp.int32)
    in_grid = (ti >= 0) & (ti < gw) & (tj >= 0) & (tj < gh)
    tic = jnp.clip(ti, 0, gw - 1)
    tjc = jnp.clip(tj, 0, gh - 1)

    uv = jnp.stack([hx / ts - ti, hz / ts - tj], axis=-1)
    uv = jnp.clip(uv, 0.0, 1.0 - 1e-6)
    if procedural:
        from .shading import shade
        rot = _grid_lookup(scene.tile_rot, tjc, tic).astype(jnp.int32)
        code = _grid_lookup(scene.shade_code, tjc, tic).astype(jnp.int32)
        cuv = _rotate_uv(uv, rot)
        ground_rgb = shade(code, cuv, annotated)
    else:
        slot = scene.tile_slot[tjc, tic] + (1 if annotated else 0)
        rot = scene.tile_rot[tjc, tic]
        cuv = _rotate_uv(uv, rot)
        ground_rgb = _sample_atlas(scene.atlas, slot, cuv)
    # outside the grid: dark floor
    ground_rgb = jnp.where(in_grid[..., None], ground_rgb,
                           jnp.asarray([60.0, 70.0, 60.0]))

    # positional light (DR light_pos): far light -> lambert on the ground
    # normal reduces to L_y/|L|, normalized so the default position is 1.0
    l_hat = dr.light_pos / (jnp.linalg.norm(dr.light_pos) + 1e-6)
    ground_light = (LIGHT_AMBIENT
                    + LIGHT_DIFFUSE * jnp.clip(l_hat[1], 0.0, 1.0)) / _LIGHT_NORM
    ground_rgb = ground_rgb * ground_light

    # sky: vertical gradient above the horizon; DR horz_mode picks the
    # colorway (reference horizon-texture swap analog)
    up = jnp.clip(dy, 0.0, 1.0)[..., None]
    sky_top = jnp.asarray(HORZ_MODES_TOP)[dr.horz_mode]
    sky_horizon = jnp.asarray(HORZ_MODES_HORIZON)[dr.horz_mode]
    sky = sky_horizon * (1 - up) + sky_top * up + dr.horizon_shift
    rgb = jnp.where(hits_ground[..., None], ground_rgb, sky)
    depth = jnp.where(hits_ground, t, jnp.inf)

    # ---- objects: vertical cylinders, nearest-hit composite
    def composite(carry, obj):
        rgb, depth = carry
        ox, oz, radius, h_obj, r, g, b, annot, draw = (
            obj[0], obj[1], obj[2], obj[3], obj[4], obj[5], obj[6], obj[7],
            obj[8])
        # ray-cylinder (axis vertical at (ox, oz))
        dx, dyr, dz = rays[..., 0], rays[..., 1], rays[..., 2]
        fx = cam_pos[0] - ox
        fz = cam_pos[2] - oz
        a = dx * dx + dz * dz
        bq = 2 * (fx * dx + fz * dz)
        c = fx * fx + fz * fz - radius * radius
        disc = bq * bq - 4 * a * c
        hit = disc > 0
        tq = (-bq - jnp.sqrt(jnp.where(hit, disc, 0.0))) / (2 * a + 1e-12)
        ylevel = cam_pos[1] + tq * dyr
        valid = hit & (tq > 0) & (ylevel > 0) & (ylevel < h_obj) & \
            (tq < depth) & (draw > 0.5)
        if annotated:
            color = jnp.where(annot > 0.5,
                              jnp.asarray(ANNOT_OBSTACLE, jnp.float32),
                              jnp.asarray([r, g, b]))
        else:
            # simple vertical shading
            color = jnp.asarray([r, g, b])
        shade = 0.7 + 0.3 * jnp.clip(ylevel / jnp.maximum(h_obj, 1e-3), 0, 1)
        shade = shade * ground_light  # DR light elevation hits objects too
        new_rgb = jnp.where(valid[..., None], color * shade[..., None], rgb)
        new_depth = jnp.where(valid, tq, depth)
        return (new_rgb, new_depth), None

    (rgb, depth), _ = jax.lax.scan(composite, (rgb, depth), scene.objects)

    # ---- OBJ/box meshes (Möller–Trumbore scan over triangles)
    from .objmesh import composite_meshes
    rgb, depth = composite_meshes(rays, cam_pos, rgb, depth, scene.meshes,
                                  annotated,
                                  jnp.asarray(ANNOT_OBSTACLE, jnp.float32),
                                  light=ground_light)

    # ---- domain randomization: light scale + camera noise
    rgb = rgb * dr.light_rgb
    noise = jax.random.normal(noise_key, rgb.shape) * dr.noise_sigma
    rgb = rgb + noise
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def render_pair(scene: SceneArrays, pos, angle, dr: DRParams, noise_key,
                **kw) -> tuple[jax.Array, jax.Array]:
    """Pixel-aligned (normal, annotated) pair: same rays, same DR, same
    noise key — alignment by construction."""
    orig = render_frame(scene, pos, angle, dr, noise_key, annotated=False, **kw)
    annot = render_frame(scene, pos, angle, dr, noise_key, annotated=True, **kw)
    return orig, annot
