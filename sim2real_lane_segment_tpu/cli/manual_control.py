"""Interactive recorder — the reference ``manual_control.py`` rebuilt.

Arrow-key / WASD driving with Enter to start/stop recording and 'a' to
cycle the annotation mode 0/1/2 (reference manual_control.py:96-115,
122-181); recordings auto-stop after 100 s like the reference.  Every
recorded step captures the pixel-aligned (annotated, original) pair —
which here is a pure re-render with identical DR parameters rather than
the reference's ``use_last_noise`` replay.

Uses an OpenCV window (needs a display).  Headless boxes should use
``cli/datagen.py``, the expert-driven automated recorder that produces
the same outputs without a human.
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

from . import common

log = logging.getLogger(__name__)

RECORDING_MAX_SECONDS = 100.0


def main(args=None) -> None:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map-name", default="small_loop")
    p.add_argument("--output_dir", default=os.path.join(os.getcwd(), "recordings"))
    p.add_argument("--annotated", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--domain-rand", action="store_true", default=True)
    p.add_argument("--distortion", action="store_true")
    p.add_argument("--frame-rate", type=int, default=30)
    p.add_argument("--texture_pack", type=str, default=None,
                   help="photographic tile-texture directory (reference "
                        "<kind>_<i>.png / _cv layout)")
    args = p.parse_args(args)
    common.setup_runtime()

    import cv2

    from ..data.videoio import AsyncVideoWriter
    from ..sim.env import DuckietownEnv

    env = DuckietownEnv(map_name=args.map_name, domain_rand=args.domain_rand,
                        annotated=args.annotated, distortion=args.distortion,
                        texture_pack=args.texture_pack)
    os.makedirs(args.output_dir, exist_ok=True)

    recording = False
    writers = None
    seq = 0
    rec_start = 0.0

    def stop_recording():
        nonlocal recording, writers
        if writers:
            writers[0].close()
            writers[1].close()
        writers, recording = None, False
        log.info("recording stopped")

    obs = env.reset()
    try:
        while True:
            key = cv2.waitKey(1000 // args.frame_rate) & 0xFF
            action = np.array([0.0, 0.0])
            if key in (27, ord("q")):
                break
            if key in (82, ord("w")):
                action = np.array([0.44, 0.0])
            elif key in (84, ord("s")):
                action = np.array([-0.44, 0.0])
            elif key in (81, ord("d")):  # left arrow steers... ref swaps
                action = np.array([0.35, 1.0])
            elif key in (83, ord("f")):
                action = np.array([0.35, -1.0])
            elif key == ord("a"):
                env.annotated = (env.annotated + 1) % 3
                if recording:
                    stop_recording()
                log.info("annotation mode -> %d", env.annotated)
            elif key in (13, 10):  # Enter
                if recording:
                    stop_recording()
                else:
                    w, h = env.camera_width, env.camera_height
                    writers = (
                        AsyncVideoWriter(os.path.join(
                            args.output_dir, f"{seq:03d}_orig.avi"),
                            frame_size=(w, h)),
                        AsyncVideoWriter(os.path.join(
                            args.output_dir, f"{seq:03d}_annot.avi"),
                            frame_size=(w, h)))
                    seq += 1
                    recording, rec_start = True, time.time()
                    log.info("recording started")

            obs, reward, done, info = env.step(action)
            if recording and env.annotated:
                annot = obs
                orig = env.render_obs(annotated=0)
                writers[0].write(orig[..., ::-1])   # RGB -> BGR like recorder
                writers[1].write(annot[..., ::-1])
                if time.time() - rec_start > RECORDING_MAX_SECONDS:
                    stop_recording()
            if done:
                if recording:
                    stop_recording()
                obs = env.reset()

            cv2.imshow("sim2real-tpu manual control", obs[..., ::-1])
    finally:
        if recording:
            stop_recording()
        cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
