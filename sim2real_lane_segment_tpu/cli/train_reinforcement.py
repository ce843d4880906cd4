"""DDPG reinforcement-learning demo CLI (reference
learning/reinforcement/pytorch/train_reinforcement.py parity): env
interaction with exploration noise, replay buffer, actor/critic updates,
periodic evaluation, weight saving."""
from __future__ import annotations

import argparse
import logging

import numpy as np

from . import common

log = logging.getLogger(__name__)


def evaluate_policy(env, ddpg, state, obs_hw, eval_episodes=2, max_steps=100):
    import cv2
    import jax.numpy as jnp

    total = 0.0
    for _ in range(eval_episodes):
        obs = env.reset()
        for _ in range(max_steps):
            small = cv2.resize(obs, (obs_hw[1], obs_hw[0]))
            action = np.asarray(ddpg.select_action(state, jnp.asarray(small[None])))[0]
            obs, reward, done, _ = env.step(action)
            total += reward
            if done:
                break
    return total / eval_episodes


def main(args=None) -> float:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map-name", default="small_loop")
    p.add_argument("--max_timesteps", type=int, default=500)
    p.add_argument("--start_timesteps", type=int, default=100,
                   help="purely random exploration steps before learning")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--expl_noise", type=float, default=0.1)
    p.add_argument("--eval_freq", type=int, default=250)
    p.add_argument("--obs-height", type=int, default=60)
    p.add_argument("--obs-width", type=int, default=80)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="ddpg_actor.msgpack")
    args = p.parse_args(args)
    common.setup_runtime()

    import cv2
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..learning.ddpg import DDPG, ReplayBuffer
    from ..sim.env import DuckietownEnv

    obs_hw = (args.obs_height, args.obs_width)
    env = DuckietownEnv(map_name=args.map_name, camera_width=160,
                        camera_height=120, domain_rand=False, seed=args.seed,
                        max_steps=200)
    ddpg = DDPG(obs_hw=obs_hw)
    state = ddpg.init_state(jax.random.key(args.seed))
    buf = ReplayBuffer(seed=args.seed)
    rng = np.random.default_rng(args.seed)

    shrink = lambda o: cv2.resize(o, (obs_hw[1], obs_hw[0]))
    obs = shrink(env.reset())
    episode_reward, episode_num = 0.0, 0
    for t in range(args.max_timesteps):
        if t < args.start_timesteps:
            action = np.array([rng.uniform(0, 1), rng.uniform(-1, 1)],
                              np.float32)
        else:
            action = np.asarray(ddpg.select_action(
                state, jnp.asarray(obs[None])))[0]
            action = action + rng.normal(0, args.expl_noise, 2)
            action = np.clip(action, [0, -1], [1, 1]).astype(np.float32)

        nobs, reward, done, _ = env.step(action)
        nobs = shrink(nobs)
        buf.add(obs, action, reward, nobs, float(done))
        obs = nobs
        episode_reward += reward

        if t >= args.start_timesteps and len(buf) >= args.batch_size:
            b = buf.sample(args.batch_size)
            state, losses = ddpg.train_step(
                state, jnp.asarray(b[0]), jnp.asarray(b[1]),
                jnp.asarray(b[2]), jnp.asarray(b[3]), jnp.asarray(b[4]))

        if done:
            log.info("episode %d: reward %.1f (t=%d)", episode_num,
                     episode_reward, t)
            obs = shrink(env.reset())
            episode_reward, episode_num = 0.0, episode_num + 1

        if (t + 1) % args.eval_freq == 0:
            avg = evaluate_policy(env, ddpg, state, obs_hw)
            log.info("eval @%d: avg reward %.1f", t + 1, avg)

    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state.actor)))
    log.info("saved %s", args.out)
    return episode_reward


if __name__ == "__main__":
    main()
