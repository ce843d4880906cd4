"""Automated data-generation CLI — the headless successor to the
reference's interactive ``manual_control.py`` recording flow.

The reference needed a human arrow-key driver and an 'A'-key annotation
cycle to record paired ``*_orig.avi``/``*_annot.avi`` files
(manual_control.py:122-181, recorder.py).  Here an expert controller
drives batched on-device rollouts and the pixel-aligned pairs stream to
the same FFV1 recording format, ready for ``postprocess`` →
``preprocess_db`` → training.  Recordings auto-stop per episode like the
reference's 100 s cap.
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
    p.add_argument("--output_dir", default=os.path.join(os.getcwd(), "recordings"))
    p.add_argument("--episodes", type=int, default=4,
                   help="number of recordings (videos) to produce")
    p.add_argument("--steps", type=int, default=256,
                   help="frames per recording")
    p.add_argument("--agents", type=int, default=1,
                   help="parallel agents per rollout batch (each gets its own video)")
    p.add_argument("--chunk", type=int, default=32,
                   help="scan length per device call")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-domain-rand", action="store_true")
    p.add_argument("--distortion", action="store_true")
    p.add_argument("--texture_pack", type=str, default=None,
                   help="directory of photographic tile textures "
                        "(reference <kind>_<i>.png / _cv layout); renders "
                        "through the atlas path instead of procedural "
                        "shading")
    args = p.parse_args(args)
    common.setup_runtime()

    import jax

    from ..data.videoio import AsyncVideoWriter
    from ..sim import lanes, render, rollout
    from ..sim.maps import builtin_map

    m = builtin_map(args.map_name)
    scene = render.build_scene(m, args.seed, texture_pack=args.texture_pack)
    lane_arrays = lanes.build_lane_arrays(m)
    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)

    os.makedirs(args.output_dir, exist_ok=True)
    seq = 0
    n_written = 0
    for ep in range(args.episodes):
        pos, angle = rollout.sample_spawns(m, lane_arrays, rng, args.agents)
        writers = []
        for a in range(args.agents):
            w_orig = AsyncVideoWriter(
                os.path.join(args.output_dir, f"{seq:03d}_orig.avi"),
                frame_size=(args.width, args.height))
            w_annot = AsyncVideoWriter(
                os.path.join(args.output_dir, f"{seq:03d}_annot.avi"),
                frame_size=(args.width, args.height))
            writers.append((w_orig, w_annot))
            seq += 1

        steps_done = 0
        while steps_done < args.steps:
            key, k = jax.random.split(key)
            batch = rollout.expert_rollout(
                scene, lane_arrays, k, pos, angle,
                tile_size=m.tile_size, n_steps=args.chunk,
                height=args.height, width=args.width,
                domain_rand=not args.no_domain_rand,
                distortion=args.distortion,
                procedural=args.texture_pack is None)
            orig = np.asarray(batch.orig)    # (T, B, H, W, 3) RGB
            annot = np.asarray(batch.annot)
            pos = batch.pos[-1]
            angle = batch.angle[-1]
            for a, (w_orig, w_annot) in enumerate(writers):
                # recorder wrote BGR (recorder.py:77)
                w_orig.write(orig[:, a, :, :, ::-1])
                w_annot.write(annot[:, a, :, :, ::-1])
            steps_done += args.chunk
            n_written += args.chunk * args.agents

        for w_orig, w_annot in writers:
            w_orig.close()
            w_annot.close()
        log.info("episode %d recorded (%d frames x %d agents)",
                 ep, args.steps, args.agents)

    log.info("wrote %d frames into %s", n_written, args.output_dir)
    return n_written


if __name__ == "__main__":
    main()
