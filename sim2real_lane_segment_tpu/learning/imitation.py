"""Behavior-cloning imitation learning (reference
learning/imitation/pytorch/ parity: 4-conv CNN head regressing expert
actions with an L2 loss, train_imitation.py:62-93, model.py:6-48).

TPU-native shape: demonstrations come from batched on-device expert
rollouts (sim.rollout), and training is one jitted step over stacked
(obs, action) pairs.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class PolicyCNN(nn.Module):
    """Small conv policy: 80x60 RGB -> (velocity, steering)."""
    n_actions: int = 2

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32) / 255.0
        for feat, stride in [(32, 2), (32, 2), (64, 2), (64, 1)]:
            x = nn.Conv(feat, (4, 4), strides=(stride, stride))(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(256)(x))
        x = nn.Dense(self.n_actions)(x)
        return jnp.tanh(x)


class ImitationState(NamedTuple):
    params: Any
    opt_state: Any


class ImitationLearner:
    def __init__(self, lr: float = 1e-4, obs_hw: tuple[int, int] = (60, 80)):
        self.model = PolicyCNN()
        self.tx = optax.sgd(lr, momentum=0.9)
        self.obs_hw = obs_hw

    def init_state(self, key) -> ImitationState:
        h, w = self.obs_hw
        params = self.model.init(key, jnp.zeros((1, h, w, 3)))["params"]
        return ImitationState(params=params, opt_state=self.tx.init(params))

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: ImitationState, obs, actions):
        def loss_fn(params):
            pred = self.model.apply({"params": params}, obs)
            return jnp.mean((pred - actions) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return ImitationState(params, opt_state), loss

    @functools.partial(jax.jit, static_argnums=0)
    def predict(self, state: ImitationState, obs):
        return self.model.apply({"params": state.params}, obs)
