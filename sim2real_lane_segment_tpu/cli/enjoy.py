"""Policy rollout viewers — the reference ``enjoy_imitation.py`` /
``enjoy_reinforcement.py`` demos, headless-capable.

Loads trained imitation (BC) or DDPG actor weights, rolls the policy in
the simulator, and either shows a window or writes the episode to an AVI
(``--out``).  Reports episode returns.
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
    p.add_argument("kind", choices=["imitation", "reinforcement"])
    p.add_argument("--weights", required=True)
    p.add_argument("--map-name", default="small_loop")
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=200)
    p.add_argument("--obs-height", type=int, default=60)
    p.add_argument("--obs-width", type=int, default=80)
    p.add_argument("--out", default=None, help="write rollout video here")
    args = p.parse_args(args)
    common.setup_runtime()

    import cv2
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..sim.env import DuckietownEnv

    env = DuckietownEnv(map_name=args.map_name, camera_width=160,
                        camera_height=120, domain_rand=False,
                        max_steps=args.max_steps)
    obs_hw = (args.obs_height, args.obs_width)

    if args.kind == "imitation":
        from ..learning.imitation import ImitationLearner
        learner = ImitationLearner(obs_hw=obs_hw)
        state = learner.init_state(jax.random.key(0))
        with open(args.weights, "rb") as f:
            params = serialization.from_bytes(
                jax.device_get(state.params), f.read())
        predict = lambda o: np.asarray(
            learner.model.apply({"params": params}, jnp.asarray(o[None])))[0]
    else:
        from ..learning.ddpg import DDPG
        ddpg = DDPG(obs_hw=obs_hw)
        st = ddpg.init_state(jax.random.key(0))
        with open(args.weights, "rb") as f:
            actor = serialization.from_bytes(jax.device_get(st.actor), f.read())
        predict = lambda o: np.asarray(
            ddpg.actor.apply({"params": actor}, jnp.asarray(o[None])))[0]

    writer = None
    if args.out:
        from ..data.videoio import AsyncVideoWriter
        writer = AsyncVideoWriter(args.out, frame_size=(160, 120))

    total = 0.0
    try:
        for ep in range(args.episodes):
            obs = env.reset()
            ep_reward = 0.0
            for _ in range(args.max_steps):
                small = cv2.resize(obs, (obs_hw[1], obs_hw[0]))
                action = predict(small)
                obs, reward, done, _ = env.step(action)
                ep_reward += reward
                if writer:
                    writer.write(obs[..., ::-1])
                if done:
                    break
            log.info("episode %d: return %.1f", ep, ep_reward)
            total += ep_reward
    finally:
        if writer:
            writer.close()
    return total / args.episodes


if __name__ == "__main__":
    main()
