"""Simulator performance benchmark — the reference ``benchmark.py``.

Same measurements (reference rightLaneDatagen/benchmark.py:11-50): env
load time, mean reset time, frame time / FPS over a timed window — plus
the TPU-native headline: batched-rollout throughput (frames/sec of
pixel-aligned pair generation on device).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

from . import common


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map-name", default="small_loop")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--resets", type=int, default=10)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--batch", type=int, default=8,
                   help="agents for the batched-rollout measurement")
    args = p.parse_args(args)
    common.setup_runtime()

    import jax

    from ..sim import lanes, render, rollout
    from ..sim.env import DuckietownEnv
    from ..sim.maps import builtin_map

    t0 = time.perf_counter()
    env = DuckietownEnv(map_name=args.map_name, camera_width=args.width,
                        camera_height=args.height, domain_rand=True)
    load_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.resets):
        env.reset()
    reset_time = (time.perf_counter() - t0) / args.resets

    env.reset()
    n_frames = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < args.seconds:
        _, _, done, _ = env.step([0.3, 0.0])
        if done:
            env.reset()
        n_frames += 1
    frame_time = (time.perf_counter() - t0) / max(n_frames, 1)

    # batched on-device rollout throughput
    m = builtin_map(args.map_name)
    scene = render.build_scene(m)
    la = lanes.build_lane_arrays(m)
    rng = np.random.default_rng(0)
    pos, angle = rollout.sample_spawns(m, la, rng, args.batch)
    fn = lambda k: rollout.expert_rollout(
        scene, la, k, pos, angle, tile_size=m.tile_size, n_steps=16,
        height=args.height, width=args.width)
    out = fn(jax.random.key(0))
    jax.block_until_ready(out)    # compile
    t0 = time.perf_counter()
    out = fn(jax.random.key(1))
    jax.block_until_ready(out)
    batch_dt = time.perf_counter() - t0
    pair_fps = 16 * args.batch / batch_dt

    results = {
        "load_time_ms": round(load_time * 1e3, 1),
        "reset_time_ms": round(reset_time * 1e3, 1),
        "frame_time_ms": round(frame_time * 1e3, 2),
        "fps": round(1.0 / frame_time, 1),
        "batched_pair_fps": round(pair_fps, 1),
    }
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
