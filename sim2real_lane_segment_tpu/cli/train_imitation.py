"""Imitation-learning demo CLI (reference learning/imitation/pytorch/
train_imitation.py parity): collect expert demonstrations from batched
on-device rollouts, behavior-clone the CNN policy, save weights."""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from . import common

log = logging.getLogger(__name__)


def main(args=None) -> float:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map-name", default="small_loop")
    p.add_argument("--episodes", type=int, default=4)
    p.add_argument("--steps", type=int, default=64, help="steps per episode")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out", default="imitation_weights.msgpack")
    p.add_argument("--obs-height", type=int, default=60)
    p.add_argument("--obs-width", type=int, default=80)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(args)
    common.setup_runtime()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..learning.imitation import ImitationLearner
    from ..sim import lanes, render, rollout
    from ..sim.expert import expert_action
    from ..sim.maps import builtin_map

    m = builtin_map(args.map_name)
    scene = render.build_scene(m, args.seed)
    la = lanes.build_lane_arrays(m)
    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)

    # ---- collect demonstrations (obs rendered at policy resolution)
    all_obs, all_act = [], []
    for ep in range(args.episodes):
        pos, angle = rollout.sample_spawns(m, la, rng, 1)
        key, k = jax.random.split(key)
        batch = rollout.expert_rollout(
            scene, la, k, pos, angle, tile_size=m.tile_size,
            n_steps=args.steps, height=args.obs_height, width=args.obs_width,
            domain_rand=True)
        acts = jax.vmap(jax.vmap(
            lambda p, a: expert_action(la, m.tile_size, p, a)))(
                batch.pos, batch.angle)
        all_obs.append(np.asarray(batch.orig[:, 0]))
        all_act.append(np.asarray(acts[:, 0]))
    obs = np.concatenate(all_obs)
    act = np.concatenate(all_act).astype(np.float32)
    log.info("collected %d demonstration frames", len(obs))

    # ---- behavior cloning
    learner = ImitationLearner(lr=args.lr,
                               obs_hw=(args.obs_height, args.obs_width))
    state = learner.init_state(jax.random.key(args.seed))
    n = len(obs)
    loss = float("nan")
    for epoch in range(args.epochs):
        perm = rng.permutation(n)
        for s in range(0, n - args.batch_size + 1, args.batch_size):
            idx = perm[s:s + args.batch_size]
            state, loss = learner.train_step(state, jnp.asarray(obs[idx]),
                                             jnp.asarray(act[idx]))
        log.info("epoch %d: bc loss %.5f", epoch, float(loss))

    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state.params)))
    log.info("saved %s", args.out)
    return float(loss)


if __name__ == "__main__":
    main()
