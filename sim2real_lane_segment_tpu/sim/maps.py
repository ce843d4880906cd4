"""Tile-map model + YAML loader (reference map format compatible).

Reads the reference's map schema (rightLaneDatagen/gym_duckietown/maps/
*.yaml: ``tiles`` grid of '<kind>/<orientation>' strings, ``tile_size``,
optional ``objects`` and ``start_tile`` — parsed by simulator.py:542-627)
and also ships freshly-authored builtin maps (straight_road, small_loop,
loop_empty, zigzag) so the datagen path needs no reference assets.

Tile kinds: straight, curve_left, curve_right, 3way_left/right, 4way,
asphalt, grass, floor.  Orientations N/E/S/W rotate the tile texture and
its lane curves.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np
import yaml

DRIVABLE_KINDS = {"straight", "curve_left", "curve_right",
                  "3way_left", "3way_right", "4way"}
ORIENTATIONS = ["N", "E", "S", "W"]


@dataclasses.dataclass
class Tile:
    kind: str
    orientation: str  # one of N/E/S/W ('N' = as-authored)
    drivable: bool


@dataclasses.dataclass
class MapObject:
    kind: str           # duckie, duckiebot, cone, barrier, ...
    pos: np.ndarray     # (x, z) in tile units
    rotate: float       # degrees
    height: float
    static: bool = True
    mesh: str | None = None  # optional OBJ path (else procedural geometry)


@dataclasses.dataclass
class Map:
    name: str
    tiles: list[list[Tile | None]]   # [row][col]
    tile_size: float
    objects: list[MapObject]
    start_tile: tuple[int, int] | None = None

    @property
    def grid_height(self) -> int:
        return len(self.tiles)

    @property
    def grid_width(self) -> int:
        return len(self.tiles[0]) if self.tiles else 0

    def drivable_tiles(self) -> list[tuple[int, int]]:
        out = []
        for j, row in enumerate(self.tiles):
            for i, t in enumerate(row):
                if t is not None and t.drivable:
                    out.append((i, j))
        return out

    def tile_at(self, i: int, j: int) -> Tile | None:
        if 0 <= j < self.grid_height and 0 <= i < self.grid_width:
            return self.tiles[j][i]
        return None


def _parse_tile(spec: str) -> Tile | None:
    spec = spec.strip()
    if spec in ("empty", "none", ""):
        return None
    if "/" in spec:
        kind, orient = spec.split("/")
        kind, orient = kind.strip(), orient.strip().upper()
    else:
        kind, orient = spec, "N"
    # reference maps use S/E/N/W suffixes after a slash
    if orient not in ORIENTATIONS:
        orient = "N"
    return Tile(kind=kind, orientation=orient, drivable=kind in DRIVABLE_KINDS)


def load_map_dict(name: str, data: dict[str, Any]) -> Map:
    tiles = [[_parse_tile(c) for c in row] for row in data["tiles"]]
    objects = []
    for obj in data.get("objects", []):
        pos = np.asarray(obj.get("pos", (0, 0)), np.float32)
        objects.append(MapObject(
            kind=obj["kind"], pos=pos[:2] if pos.size >= 2 else pos,
            rotate=float(obj.get("rotate", 0.0)),
            height=float(obj.get("height", 0.1)),
            static=bool(obj.get("static", True)),
            mesh=obj.get("mesh")))
    start = data.get("start_tile")
    return Map(name=name, tiles=tiles,
               tile_size=float(data.get("tile_size", 0.585)),
               objects=objects,
               start_tile=tuple(start) if start else None)


def load_map(path: str) -> Map:
    with open(path) as f:
        data = yaml.safe_load(f)
    return load_map_dict(os.path.splitext(os.path.basename(path))[0], data)


# ---------------------------------------------------------------------------
# builtin maps (authored here, not copied)
# ---------------------------------------------------------------------------

# Orientation cheat sheet (derived from the uv rotation + canonical flows;
# see lanes.py): straight/N flows north, /S south, /W east, /E west.
# curve_left connects: /N south-edge->west, /W west->north, /S north->east,
# /E east->south.  curve_right: /N south->east, /W west->south,
# /S north->west, /E east->north.  A counterclockwise ring is therefore:
# west column straight/S, SW corner curve_left/S, bottom edge straight/W,
# SE corner curve_left/W, east column straight/N, NE corner curve_left/N,
# top edge straight/E, NW corner curve_left/E.
BUILTIN_MAPS: dict[str, dict] = {
    "straight_road": {
        "tile_size": 0.585,
        "tiles": [
            ["floor"] + ["straight/E"] * 6 + ["floor"],
        ],
    },
    "small_loop": {
        "tile_size": 0.585,
        "tiles": [
            ["curve_left/E", "straight/E", "curve_left/N"],
            ["straight/S", "asphalt", "straight/N"],
            ["curve_left/S", "straight/W", "curve_left/W"],
        ],
    },
    "loop_empty": {
        "tile_size": 0.585,
        "tiles": [
            ["curve_left/E", "straight/E", "straight/E", "straight/E", "curve_left/N"],
            ["straight/S", "asphalt", "asphalt", "asphalt", "straight/N"],
            ["straight/S", "asphalt", "grass", "asphalt", "straight/N"],
            ["straight/S", "asphalt", "asphalt", "asphalt", "straight/N"],
            ["curve_left/S", "straight/W", "straight/W", "straight/W", "curve_left/W"],
        ],
    },
    "zigzag": {
        "tile_size": 0.585,
        "tiles": [
            ["curve_left/E", "straight/E", "curve_left/N", "floor", "floor"],
            ["straight/S", "grass", "curve_right/E", "straight/E", "curve_left/N"],
            ["straight/S", "grass", "grass", "grass", "straight/N"],
            ["curve_left/S", "straight/W", "straight/W", "straight/W", "curve_left/W"],
        ],
        "objects": [
            {"kind": "duckie", "pos": [2.5, 2.5], "rotate": 90, "height": 0.08},
            {"kind": "cone", "pos": [1.5, 0.6], "rotate": 0, "height": 0.08},
        ],
    },
}


def builtin_map(name: str) -> Map:
    if name not in BUILTIN_MAPS:
        raise KeyError(f"unknown builtin map {name!r}; "
                       f"available: {sorted(BUILTIN_MAPS)}")
    return load_map_dict(name, BUILTIN_MAPS[name])
