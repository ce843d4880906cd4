"""Fully on-device batched rollouts: physics + expert + paired rendering
inside one lax.scan — the TPU-native replacement for interactive
recording (manual_control.py) at data-generation scale.

One call produces T steps × B agents of pixel-aligned (orig, annot)
frame pairs without any host round-trip per frame.  Downstream, the
pairs feed ops.labelgen.process_classes on device, so sim-video →
training-batch never leaves the chip (the BASELINE.json north star).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lanes, physics, render
from .expert import expert_action
from .render import DRParams, SceneArrays


class RolloutBatch(NamedTuple):
    orig: jax.Array    # (T, B, H, W, 3) uint8
    annot: jax.Array   # (T, B, H, W, 3) uint8
    pos: jax.Array     # (T, B, 2)
    angle: jax.Array   # (T, B)


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "height", "width", "tile_size",
                                    "frame_skip", "distortion", "domain_rand",
                                    "procedural"))
def expert_rollout(scene: SceneArrays, lane_arrays, key: jax.Array,
                   init_pos: jax.Array, init_angle: jax.Array, *,
                   tile_size: float, n_steps: int = 64,
                   height: int = 480, width: int = 640,
                   frame_skip: int = 1, distortion: bool = False,
                   domain_rand: bool = True,
                   procedural: bool = True) -> RolloutBatch:
    """Scan an expert-driven rollout for a batch of agents.

    init_pos (B, 2), init_angle (B,) — spawn with ``sample_spawns``.
    """
    B = init_pos.shape[0]
    k_dr, k_noise = jax.random.split(key)
    if domain_rand:
        dr = jax.vmap(DRParams.sample)(jax.random.split(k_dr, B))
    else:
        dr = jax.vmap(lambda _: DRParams.default())(jnp.arange(B))

    render_b = jax.vmap(
        lambda pos, angle, dr_p, nk, ann: render.render_frame(
            scene, pos, angle, dr_p, nk, height=height, width=width,
            annotated=ann, distortion=distortion, procedural=procedural),
        in_axes=(0, 0, 0, 0, None))

    def step_fn(carry, step_key):
        pos, angle = carry
        act = jax.vmap(lambda p, a: expert_action(
            lane_arrays, tile_size, p, a))(pos, angle)
        duty = jax.vmap(lambda a: physics.wheel_duty_from_action(a[0], a[1]))(act)

        def one_phys(p, a, d):
            st = physics.AgentState(pos=p, angle=a, vels=d)
            for _ in range(frame_skip):
                st = physics.step_pose(st, d, dt=1.0 / 30.0)
            return st.pos, st.angle

        pos, angle = jax.vmap(one_phys)(pos, angle, duty)
        nks = jax.random.split(step_key, B)
        orig = render_b(pos, angle, dr, nks, False)
        annot = render_b(pos, angle, dr, nks, True)
        return (pos, angle), (orig, annot, pos, angle)

    keys = jax.random.split(k_noise, n_steps)
    _, (orig, annot, pos, angle) = jax.lax.scan(
        step_fn, (init_pos, init_angle), keys)
    return RolloutBatch(orig=orig, annot=annot, pos=pos, angle=angle)


def sample_spawns(m, lane_arrays, rng, batch: int):
    """Host-side spawn sampling near a lane center, lane-aligned.

    Lanes are two-way (reference tiles carry curves for both directions,
    simulator.py:860-875), so a random heading picks which direction's
    lane the spawn snaps to."""
    import numpy as np
    drivable = m.drivable_tiles()
    poss, angles = [], []
    while len(poss) < batch:
        i, j = drivable[rng.integers(len(drivable))]
        ts = m.tile_size
        pos = np.array([(i + rng.uniform(0.15, 0.85)) * ts,
                        (j + rng.uniform(0.15, 0.85)) * ts], np.float32)
        probe = rng.uniform(0.0, 2 * np.pi)
        lp = jax.device_get(lanes.lane_pos(
            lane_arrays, ts, jnp.asarray(pos), jnp.asarray(probe, jnp.float32)))
        if not bool(lp.in_lane) or abs(float(lp.dist)) > 0.15:
            continue
        t = np.asarray(lp.tangent)
        angle = float(np.arctan2(-t[1], t[0])) + rng.uniform(-0.15, 0.15)
        poss.append(pos)
        angles.append(angle)
    return (jnp.asarray(np.stack(poss)), jnp.asarray(np.asarray(angles, np.float32)))
