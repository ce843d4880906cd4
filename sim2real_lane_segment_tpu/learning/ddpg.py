"""DDPG reinforcement learning (reference learning/reinforcement/pytorch/
parity: ActorCNN/CriticCNN with target networks + tau soft updates,
ddpg.py:16-223; ReplayBuffer with random eviction, utils.py:18-57).

JAX-native: actor/critic updates are one jitted step each; the replay
buffer is a host-side ring with random eviction matching the reference's
sampling semantics.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class ActorCNN(nn.Module):
    max_action: float = 1.0

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32) / 255.0
        for feat in (32, 32, 64):
            x = nn.relu(nn.Conv(feat, (4, 4), strides=(2, 2))(x))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(256)(x))
        a = nn.Dense(2)(x)
        # action[0] = velocity in [0,1] (sigmoid), action[1] = steering tanh
        return jnp.stack([nn.sigmoid(a[:, 0]),
                          jnp.tanh(a[:, 1])], axis=-1) * self.max_action


class CriticCNN(nn.Module):
    @nn.compact
    def __call__(self, x, action):
        x = x.astype(jnp.float32) / 255.0
        for feat in (32, 32, 64):
            x = nn.relu(nn.Conv(feat, (4, 4), strides=(2, 2))(x))
        x = x.reshape((x.shape[0], -1))
        x = jnp.concatenate([x, action], axis=-1)
        x = nn.relu(nn.Dense(256)(x))
        return nn.Dense(1)(x)[:, 0]


class ReplayBuffer:
    """Ring buffer with random eviction when full (utils.py:18-57)."""

    def __init__(self, max_size: int = 10000, seed: int = 0):
        self.storage: list = []
        self.max_size = max_size
        self.rng = np.random.default_rng(seed)

    def add(self, obs, action, reward, next_obs, done):
        item = (obs, action, reward, next_obs, done)
        if len(self.storage) < self.max_size:
            self.storage.append(item)
        else:
            self.storage[self.rng.integers(len(self.storage))] = item

    def sample(self, batch_size: int):
        idx = self.rng.integers(len(self.storage), size=batch_size)
        obs, act, rew, nobs, done = zip(*[self.storage[i] for i in idx])
        return (np.stack(obs), np.stack(act),
                np.asarray(rew, np.float32), np.stack(nobs),
                np.asarray(done, np.float32))

    def __len__(self):
        return len(self.storage)


class DDPGState(NamedTuple):
    actor: Any
    critic: Any
    actor_target: Any
    critic_target: Any
    actor_opt: Any
    critic_opt: Any


class DDPG:
    def __init__(self, obs_hw=(60, 80), lr=1e-4, gamma=0.99, tau=0.005):
        self.actor = ActorCNN()
        self.critic = CriticCNN()
        self.gamma, self.tau = gamma, tau
        self.actor_tx = optax.adam(lr)
        self.critic_tx = optax.adam(lr)
        self.obs_hw = obs_hw

    def init_state(self, key) -> DDPGState:
        h, w = self.obs_hw
        ka, kc = jax.random.split(key)
        obs0 = jnp.zeros((1, h, w, 3))
        actor = self.actor.init(ka, obs0)["params"]
        critic = self.critic.init(kc, obs0, jnp.zeros((1, 2)))["params"]
        return DDPGState(actor=actor, critic=critic,
                         actor_target=jax.tree_util.tree_map(jnp.copy, actor),
                         critic_target=jax.tree_util.tree_map(jnp.copy, critic),
                         actor_opt=self.actor_tx.init(actor),
                         critic_opt=self.critic_tx.init(critic))

    @functools.partial(jax.jit, static_argnums=0)
    def select_action(self, state: DDPGState, obs):
        return self.actor.apply({"params": state.actor}, obs)

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: DDPGState, obs, action, reward, next_obs, done):
        # critic: TD target from target nets
        next_a = self.actor.apply({"params": state.actor_target}, next_obs)
        target_q = self.critic.apply({"params": state.critic_target},
                                     next_obs, next_a)
        y = reward + (1.0 - done) * self.gamma * target_q

        def critic_loss(params):
            q = self.critic.apply({"params": params}, obs, action)
            return jnp.mean((q - y) ** 2)

        closs, cgrads = jax.value_and_grad(critic_loss)(state.critic)
        cupd, copt = self.critic_tx.update(cgrads, state.critic_opt)
        critic = optax.apply_updates(state.critic, cupd)

        def actor_loss(params):
            a = self.actor.apply({"params": params}, obs)
            return -jnp.mean(self.critic.apply({"params": critic}, obs, a))

        aloss, agrads = jax.value_and_grad(actor_loss)(state.actor)
        aupd, aopt = self.actor_tx.update(agrads, state.actor_opt)
        actor = optax.apply_updates(state.actor, aupd)

        soft = lambda t, s: jax.tree_util.tree_map(
            lambda a, b: (1 - self.tau) * a + self.tau * b, t, s)
        return DDPGState(
            actor=actor, critic=critic,
            actor_target=soft(state.actor_target, actor),
            critic_target=soft(state.critic_target, critic),
            actor_opt=aopt, critic_opt=copt), {"critic_loss": closs,
                                               "actor_loss": aloss}
