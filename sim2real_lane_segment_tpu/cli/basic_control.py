"""Pose-based control exercise — the reference ``exercises/basic_control.py``.

Drives the simulator with the analytic lane-following P-controller
(sim/expert.py) for a fixed number of steps, printing pose, reward and
lane position — the "hello world" of the sim API. Headless; add
``--out`` to record the run to an AVI.
"""
from __future__ import annotations

import argparse
import logging

import numpy as np

from . import common

log = logging.getLogger(__name__)


def main(args=None) -> float:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map-name", default="small_loop")
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--out", default=None)
    args = p.parse_args(args)
    common.setup_runtime()

    import jax.numpy as jnp

    from ..sim.env import DuckietownEnv
    from ..sim.expert import expert_action

    env = DuckietownEnv(map_name=args.map_name, camera_width=160,
                        camera_height=120, domain_rand=False,
                        max_steps=args.steps + 1)
    writer = None
    if args.out:
        from ..data.videoio import AsyncVideoWriter
        writer = AsyncVideoWriter(args.out, frame_size=(160, 120))

    obs = env.reset()
    total = 0.0
    try:
        for step in range(args.steps):
            act = np.asarray(expert_action(
                env.lane_arrays, env.map.tile_size,
                jnp.asarray(env.cur_pos), jnp.asarray(env.cur_angle)))
            obs, reward, done, info = env.step(act)
            total += reward
            if writer:
                writer.write(obs[..., ::-1])
            if step % 30 == 0:
                s = info["Simulator"]
                log.info("step %d: pos (%.2f, %.2f) dist %.3f reward %.2f",
                         step, *s["cur_pos"], s["lane_dist"], reward)
            if done:
                log.info("done: %s", info["msg"])
                break
    finally:
        if writer:
            writer.close()
    log.info("total reward %.1f over %d steps", total, step + 1)
    return total


if __name__ == "__main__":
    main()
