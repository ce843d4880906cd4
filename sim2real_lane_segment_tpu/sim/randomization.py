"""JSON-config-driven domain randomization (reference
gym_duckietown/randomization/ parity).

The reference's ``Randomizer`` drew int/uniform/normal samples per config
key each episode (randomizer.py:22-72, config/default_dr.json keys:
horz_mode, light_pos, camera_noise, frame_skip).  Here the same config
schema drives a key-split JAX sampler so randomization composes with the
batched on-device rollouts.  Consumed by ``render.DRParams.sample`` /
``from_draws`` (light_pos -> positional lighting, horz_mode -> sky
colorway, frame_skip -> env.step physics substeps) — a config-file change
visibly alters rendered frames.

Config entry schema (same as the reference JSONs; "int" high is
EXCLUSIVE, numpy randint semantics like the reference):
  {"<name>": {"type": "int"|"uniform"|"normal", "low": .., "high": ..,
              "loc": .., "scale": .., "size": N}}
"""
from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp

DEFAULT_DR_CONFIG: dict[str, Any] = {
    "horz_mode": {"type": "int", "low": 0, "high": 4},
    "light_pos": {"type": "uniform", "low": [-150, 170, -150],
                  "high": [150, 220, 150], "size": 3},
    "light_scale": {"type": "uniform", "low": 0.75, "high": 1.15, "size": 3},
    "camera_noise": {"type": "uniform", "low": 0.0, "high": 4.0},
    "horizon_shift": {"type": "uniform", "low": -25.0, "high": 25.0},
    "frame_skip": {"type": "int", "low": 1, "high": 2},
}

DEFAULT_CONFIG: dict[str, Any] = {
    "horz_mode": {"type": "int", "low": 0, "high": 1},
    "light_pos": {"type": "uniform", "low": [-40, 200, 100],
                  "high": [-40, 200, 100], "size": 3},
    "light_scale": {"type": "uniform", "low": 1.0, "high": 1.0, "size": 3},
    "camera_noise": {"type": "uniform", "low": 0.0, "high": 0.0},
    "horizon_shift": {"type": "uniform", "low": 0.0, "high": 0.0},
    "frame_skip": {"type": "int", "low": 1, "high": 1},
}


class Randomizer:
    def __init__(self, randomization_config_fp: str | None = None,
                 default_config_fp: str | None = None):
        if randomization_config_fp is not None:
            with open(randomization_config_fp) as f:
                self.randomization_config = json.load(f)
        else:
            self.randomization_config = dict(DEFAULT_DR_CONFIG)
        if default_config_fp is not None:
            with open(default_config_fp) as f:
                self.default_config = json.load(f)
        else:
            self.default_config = dict(DEFAULT_CONFIG)

    def randomize(self, key: jax.Array) -> dict[str, jax.Array]:
        """Draw one sample per config key (jit/vmap friendly)."""
        out = {}
        keys = jax.random.split(key, len(self.randomization_config))
        for k, (name, spec) in zip(keys, sorted(self.randomization_config.items())):
            out[name] = _draw(k, spec)
        return out

    def defaults(self) -> dict[str, jax.Array]:
        return {name: _draw(jax.random.key(0), spec)
                for name, spec in sorted(self.default_config.items())}


def _draw(key: jax.Array, spec: dict[str, Any]) -> jax.Array:
    kind = spec.get("type", "uniform")
    size = spec.get("size", 1)
    shape = (size,) if size > 1 else ()
    if kind == "int":
        # exclusive high, matching the reference's np.random.randint
        # (randomizer.py:41) — note its default_dr frame_skip (1, 2)
        # therefore ALWAYS draws 1 (QUIRKS.md)
        return jax.random.randint(key, shape, int(spec["low"]),
                                  int(spec["high"]))
    if kind == "uniform":
        low = jnp.asarray(spec["low"], jnp.float32)
        high = jnp.asarray(spec["high"], jnp.float32)
        return jax.random.uniform(key, shape, minval=low, maxval=high)
    if kind == "normal":
        return spec.get("loc", 0.0) + spec.get("scale", 1.0) * \
            jax.random.normal(key, shape)
    raise ValueError(f"unknown randomization type {kind!r}")
