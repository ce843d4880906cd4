"""OBJ/MTL mesh loading + ray-triangle rendering (reference objmesh.py).

The reference loaded OBJ meshes with per-material chunked vertex lists
and rendered them through OpenGL display lists (objmesh.py:9-302, with an
``annotated`` texture swap for the duckiebot mesh).  Here:

- ``load_obj`` parses OBJ (v/f, negative indices, fan-triangulated
  polygons) and MTL diffuse colors into flat triangle arrays;
- ``MeshSet`` packs every mesh instance in a scene into one
  (T, 3, 3) vertex tensor + (T, 3) colors + (T,) annotated flags;
- the renderer composites meshes with a Möller–Trumbore ray-triangle
  test vectorized over all pixels and scanned over triangles — ~30 flops
  per pixel-triangle, so a few hundred triangles cost ~1 GFLOP/frame:
  trivially VPU-feasible and entirely gather-free.

Like every other object, annotated renders paint obstacle meshes pure
red so the label extractor classifies them (class 3).
"""
from __future__ import annotations

import dataclasses
import os
import typing

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ObjMesh:
    vertices: np.ndarray   # (T, 3, 3) float32 triangles (object space)
    colors: np.ndarray     # (T, 3) float32 per-triangle diffuse RGB 0..255

    @property
    def num_triangles(self) -> int:
        return len(self.vertices)


_cache: dict[str, ObjMesh] = {}


def load_mtl(path: str) -> dict[str, np.ndarray]:
    mats, cur = {}, None
    if not os.path.exists(path):
        return mats
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "newmtl":
                cur = parts[1]
            elif parts[0] == "Kd" and cur:
                mats[cur] = np.asarray([float(x) for x in parts[1:4]]) * 255.0
    return mats


def load_obj(path: str, default_color=(150.0, 150.0, 150.0)) -> ObjMesh:
    """Parse an OBJ file (with optional sibling MTL) into triangle arrays.
    Results are cached per path like the reference's mesh cache
    (objmesh.py:17-32)."""
    if path in _cache:
        return _cache[path]
    verts: list = []
    tris: list = []
    cols: list = []
    mats: dict = {}
    color = np.asarray(default_color, np.float64)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if parts[0] == "mtllib":
                mats = load_mtl(os.path.join(os.path.dirname(path), parts[1]))
            elif parts[0] == "usemtl":
                color = mats.get(parts[1], np.asarray(default_color))
            elif parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = []
                for tok in parts[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tris.append((idx[0], idx[k], idx[k + 1]))
                    cols.append(color)
    v = np.asarray(verts, np.float32)
    mesh = ObjMesh(
        vertices=v[np.asarray(tris, np.int32)] if tris else
        np.zeros((0, 3, 3), np.float32),
        colors=np.asarray(cols, np.float32) if cols else
        np.zeros((0, 3), np.float32))
    _cache[path] = mesh
    return mesh


def make_box_mesh(sx: float, sy: float, sz: float, color) -> ObjMesh:
    """Procedural axis-aligned box mesh (stand-in geometry when no OBJ
    asset is on disk)."""
    x, y, z = sx / 2, sy, sz / 2
    p = np.array([[-x, 0, -z], [x, 0, -z], [x, 0, z], [-x, 0, z],
                  [-x, y, -z], [x, y, -z], [x, y, z], [-x, y, z]], np.float32)
    faces = [(0, 2, 1), (0, 3, 2), (4, 5, 6), (4, 6, 7),
             (0, 1, 5), (0, 5, 4), (1, 2, 6), (1, 6, 5),
             (2, 3, 7), (2, 7, 6), (3, 0, 4), (3, 4, 7)]
    return ObjMesh(vertices=p[np.asarray(faces, np.int32)],
                   colors=np.tile(np.asarray(color, np.float32), (12, 1)))


def place_mesh(mesh: ObjMesh, pos_xz, rotate_deg: float,
               scale: float = 1.0) -> np.ndarray:
    """Instance a mesh into world space: scale, yaw-rotate, translate."""
    a = np.radians(rotate_deg)
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
    v = mesh.vertices * scale @ rot.T
    v = v + np.asarray([pos_xz[0], 0.0, pos_xz[1]], np.float32)
    return v


class MeshSet(typing.NamedTuple):
    """All scene mesh triangles packed for the renderer (a NamedTuple so
    it traces as a pytree inside jitted render calls)."""
    vertices: jax.Array   # (T, 3, 3)
    colors: jax.Array     # (T, 3)
    annotated: jax.Array  # (T,) 1.0 when the owning object is an obstacle

    @staticmethod
    def empty() -> "MeshSet":
        far = np.full((1, 3, 3), 1e9, np.float32)
        return MeshSet(vertices=jnp.asarray(far),
                       colors=jnp.zeros((1, 3), jnp.float32),
                       annotated=jnp.zeros((1,), jnp.float32))

    @staticmethod
    def build(instances) -> "MeshSet":
        """instances: list of (world_vertices (T,3,3), colors (T,3),
        annotated flag)."""
        if not instances:
            return MeshSet.empty()
        vs = np.concatenate([v for v, _, _ in instances])
        cs = np.concatenate([c for _, c, _ in instances])
        fl = np.concatenate([np.full(len(v), f, np.float32)
                             for v, _, f in instances])
        return MeshSet(vertices=jnp.asarray(vs), colors=jnp.asarray(cs),
                       annotated=jnp.asarray(fl))


def composite_meshes(rays, cam_pos, rgb, depth, meshes: MeshSet,
                     annotated: bool, annot_color):
    """Möller–Trumbore nearest-hit composite, scanned over triangles."""

    def per_tri(carry, tri):
        rgb, depth = carry
        v, color, annot = tri
        e1 = v[1] - v[0]
        e2 = v[2] - v[0]
        h = jnp.cross(rays, e2)          # (H, W, 3)
        a = jnp.sum(e1 * h, axis=-1)
        f = 1.0 / jnp.where(jnp.abs(a) > 1e-9, a, 1e-9)
        s = cam_pos - v[0]
        u = f * jnp.sum(s * h, axis=-1)
        q = jnp.cross(s, e1)
        w = f * jnp.sum(rays * q, axis=-1)
        t = f * jnp.sum(e2 * q)   # scalar dot broadcast over (H, W) via f
        valid = (jnp.abs(a) > 1e-9) & (u >= 0) & (w >= 0) & (u + w <= 1) & \
                (t > 1e-4) & (t < depth)
        if annotated:
            c = jnp.where(annot > 0.5, jnp.asarray(annot_color, jnp.float32),
                          color)
        else:
            c = color
        new_rgb = jnp.where(valid[..., None], c, rgb)
        new_depth = jnp.where(valid, t, depth)
        return (new_rgb, new_depth), None

    (rgb, depth), _ = jax.lax.scan(
        per_tri, (rgb, depth),
        (meshes.vertices, meshes.colors, meshes.annotated))
    return rgb, depth
