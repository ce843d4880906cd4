"""Gym-style simulator environment over the JAX world.

Capability-parity rebuild of the reference ``Simulator(gym.Env)``
(simulator.py:127) and ``DuckietownEnv`` (envs/duckietown_env.py:9):
reset with spawn search over drivable tiles (simulator.py:484-529, retry
cap MAX_SPAWN_ATTEMPTS), step = frame_skip physics updates + render +
reward (simulator.py:1358-1379), reward = speed*dot_dir - 10|dist| +
40*col_penalty with -1000 on invalid pose (compute_reward:1339-1356),
domain randomization per reset, and the fork's ``annotated`` mode
rendering recolored textures for pixel-aligned pair capture.

Fixed reference quirk (documented, SURVEY.md §7): the reference never
incremented ``step_count`` so ``max_steps`` was dead code
(simulator.py:1248,1390); here steps count and the episode truncates.

The render path is jitted; physics/bookkeeping run on host numpy for
gym-API ergonomics.  For bulk data generation use ``sim.rollout`` which
keeps everything (physics + render) on device, batched.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import collision, lanes, npc as npc_mod, physics, render
from .maps import Map, builtin_map

MAX_SPAWN_ATTEMPTS = 5000
REWARD_INVALID_POSE = -1000.0
DEFAULT_ROBOT_SPEED = 1.20


@dataclasses.dataclass
class StepInfo:
    lane_dist: float
    dot_dir: float
    tile: tuple[int, int]
    msg: str = ""


class Simulator:
    """Single-agent gym-style env; obs = (camera_height, camera_width, 3) RGB."""

    def __init__(self, map_name: str = "small_loop", *, seed: int = 0,
                 camera_width: int = 640, camera_height: int = 480,
                 frame_skip: int = 1, max_steps: int = 1500,
                 domain_rand: bool = True, annotated: int = 0,
                 distortion: bool = False, map_obj: Map | None = None,
                 accept_start_angle_deg: float = 60.0,
                 randomization_config_fp: str | None = None,
                 default_config_fp: str | None = None,
                 texture_pack: str | None = None):
        from .randomization import Randomizer
        self.randomizer = Randomizer(randomization_config_fp,
                                     default_config_fp)
        self.map = map_obj if map_obj is not None else builtin_map(map_name)
        # photographic texture packs render through the atlas gather path;
        # the default procedural path shades tiles in closed form
        self.texture_pack = texture_pack
        self.procedural = texture_pack is None
        self.scene, self._mesh_layout = render.build_scene(
            self.map, seed, with_layout=True, texture_pack=texture_pack)
        self.lane_arrays = lanes.build_lane_arrays(self.map)
        self.camera_width = camera_width
        self.camera_height = camera_height
        self.frame_skip = frame_skip
        self.max_steps = max_steps
        self.domain_rand = domain_rand
        self.annotated = annotated  # 0 normal, 1/2 annotated variants
        self.distortion = distortion
        self.accept_start_angle_deg = accept_start_angle_deg
        self.rng = np.random.default_rng(seed)
        self._key = jax.random.key(seed)
        self.step_count = 0
        self.cur_pos = np.zeros(2, np.float32)
        self.cur_angle = 0.0
        self.speed = 0.0
        self.dr = render.DRParams.default()
        self.npcs = self._build_npcs()
        self.reset()

    def _build_npcs(self) -> list:
        """Dynamic objects from the map: non-static duckiebots become
        lane-following NPCs, non-static duckies walking pedestrians, and
        'trafficlight' objects period lights (reference objects.py)."""
        npcs = []
        ts = self.map.tile_size
        for i, o in enumerate(self.map.objects):
            if o.kind == "duckiebot" and not o.static:
                npcs.append(npc_mod.DuckiebotNPC(
                    pos=np.asarray(o.pos, np.float32) * ts,
                    angle=np.radians(o.rotate), obj_index=i))
            elif o.kind == "duckie" and not o.static:
                base = np.asarray(o.pos, np.float32) * ts
                d = np.radians(o.rotate)
                offset = np.array([np.cos(d), -np.sin(d)], np.float32) * 0.2
                npcs.append(npc_mod.DuckiePedestrian(
                    start=base - offset, end=base + offset, obj_index=i))
            elif o.kind == "trafficlight":
                npcs.append(npc_mod.TrafficLight(obj_index=i))
        return npcs

    def _step_npcs(self) -> None:
        if not self.npcs:
            return
        new_objects = npc_mod.step_npcs(
            self.npcs, np.asarray(self.scene.objects), self.lane_arrays,
            self.map.tile_size)
        self.scene = self.scene._replace(objects=jnp.asarray(new_objects))
        # dynamic duckiebots also own mesh triangles — re-place them at
        # the NPC's new pose so the rendered mesh moves with the object
        moved = [n for n in self.npcs
                 if isinstance(n, npc_mod.DuckiebotNPC)
                 and n.obj_index in self._mesh_layout]
        if moved:
            from .objmesh import place_mesh
            verts = self.scene.meshes.vertices
            # device-side slice updates: only the moved NPC's triangles
            # upload, no full-tensor host round trip
            for n in moved:
                start, count, mesh, _ = self._mesh_layout[n.obj_index]
                verts = verts.at[start:start + count].set(
                    jnp.asarray(place_mesh(mesh, n.pos, np.degrees(n.angle))))
            self.scene = self.scene._replace(
                meshes=self.scene.meshes._replace(vertices=verts))

    # -- helpers ------------------------------------------------------------

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _lane_pos(self, pos, angle):
        return jax.device_get(lanes.lane_pos(
            self.lane_arrays, self.map.tile_size,
            jnp.asarray(pos, jnp.float32), jnp.asarray(angle, jnp.float32)))

    def _valid_pose(self, pos, angle) -> bool:
        lp = self._lane_pos(pos, angle)
        if not (bool(lp.in_lane) and abs(float(lp.dist)) < 0.5):
            return False
        return not bool(collision.collides_with_objects(
            jnp.asarray(pos), jnp.asarray(angle), self.scene.objects))

    # -- gym API ------------------------------------------------------------

    def reset(self):
        if self.domain_rand:
            self.dr = render.DRParams.sample(self._next_key(),
                                             self.randomizer)
        else:
            self.dr = render.DRParams.from_draws(self.randomizer.defaults())
        # fresh per-episode camera-noise stream (folded with step_count per
        # frame); orig/annot pairs stay aligned because both renders of a
        # step share the same folded key
        self._noise_base = self._next_key()

        drivable = self.map.drivable_tiles()
        if not drivable:
            raise RuntimeError("map has no drivable tiles")
        for _ in range(MAX_SPAWN_ATTEMPTS):
            if self.map.start_tile is not None:
                i, j = self.map.start_tile
            else:
                i, j = drivable[self.rng.integers(len(drivable))]
            ts = self.map.tile_size
            pos = np.array([(i + self.rng.uniform(0.2, 0.8)) * ts,
                            (j + self.rng.uniform(0.2, 0.8)) * ts], np.float32)
            # lanes are two-way: a random probe heading picks which
            # direction's lane curve the spawn aligns to
            lp = self._lane_pos(pos, self.rng.uniform(0.0, 2 * np.pi))
            if not bool(lp.in_lane):
                continue
            # face along the lane tangent ± accept angle
            tangent = np.asarray(lp.tangent)
            base = float(np.arctan2(-tangent[1], tangent[0]))
            angle = base + np.radians(
                self.rng.uniform(-self.accept_start_angle_deg,
                                 self.accept_start_angle_deg))
            if abs(float(lp.dist)) < 0.25:
                break
        else:
            raise RuntimeError(
                f"could not find a valid spawn in {MAX_SPAWN_ATTEMPTS} attempts")

        self.cur_pos = pos
        self.cur_angle = angle
        self.speed = 0.0
        self.step_count = 0
        return self.render_obs()

    def update_physics(self, action):
        state = physics.AgentState(
            pos=jnp.asarray(self.cur_pos), angle=jnp.asarray(self.cur_angle),
            vels=jnp.asarray(action, jnp.float32))
        new = jax.device_get(physics.step_pose(
            state, jnp.asarray(action, jnp.float32), dt=1.0 / 30.0))
        delta = np.linalg.norm(np.asarray(new.pos) - self.cur_pos)
        self.speed = float(delta * 30.0)
        self.cur_pos = np.asarray(new.pos, np.float32)
        self.cur_angle = float(new.angle)

    def compute_reward(self) -> float:
        """reference compute_reward (simulator.py:1339-1356):
        speed*dot_dir - 10|dist| + 40*col_penalty; NotInLane -> 40*col."""
        col = float(collision.proximity_penalty(
            jnp.asarray(self.cur_pos), jnp.asarray(self.cur_angle),
            self.scene.objects))
        lp = self._lane_pos(self.cur_pos, self.cur_angle)
        if not bool(lp.in_lane):
            return 40.0 * col
        return float(1.0 * self.speed * float(lp.dot_dir)
                     - 10.0 * abs(float(lp.dist)) + 40.0 * col)

    def step(self, action):
        action = np.clip(np.asarray(action, np.float32), -1, 1)
        # under domain randomization the DR draw REPLACES the configured
        # frame skip (reference simulator.py:1363-1369)
        skip = int(self.dr.frame_skip) if self.domain_rand else self.frame_skip
        for _ in range(skip):
            self.update_physics(action)
        self._step_npcs()
        self.step_count += 1

        obs = self.render_obs()
        if not self._valid_pose(self.cur_pos, self.cur_angle):
            return obs, REWARD_INVALID_POSE, True, \
                {"msg": "invalid-pose", "Simulator": self._info()}
        if self.step_count >= self.max_steps:
            return obs, 0.0, True, \
                {"msg": "max-steps-reached", "Simulator": self._info()}
        return obs, self.compute_reward(), False, \
            {"msg": "in-progress", "Simulator": self._info()}

    def _info(self):
        lp = self._lane_pos(self.cur_pos, self.cur_angle)
        return {"robot_speed": self.speed,
                "cur_pos": self.cur_pos.tolist(),
                "cur_angle": self.cur_angle,
                "lane_dist": float(lp.dist), "dot_dir": float(lp.dot_dir)}

    def render_obs(self, annotated: int | None = None) -> np.ndarray:
        """Render the camera frame; with ``annotated`` override (the
        reference's render_obs(use_last_noise=True) re-render becomes a
        simple pure call — same DR params, same noise key)."""
        ann = self.annotated if annotated is None else annotated
        frame = render.render_frame(
            self.scene, jnp.asarray(self.cur_pos), jnp.asarray(self.cur_angle),
            self.dr, jax.random.fold_in(self._noise_base, self.step_count),
            height=self.camera_height, width=self.camera_width,
            annotated=bool(ann), distortion=self.distortion,
            procedural=self.procedural)
        return np.asarray(frame)

    def render_pair(self) -> tuple[np.ndarray, np.ndarray]:
        """Pixel-aligned (orig, annotated) frames at the current pose."""
        key = jax.random.fold_in(self._noise_base, self.step_count)
        orig, annot = render.render_pair(
            self.scene, jnp.asarray(self.cur_pos), jnp.asarray(self.cur_angle),
            self.dr, key, height=self.camera_height, width=self.camera_width,
            distortion=self.distortion, procedural=self.procedural)
        return np.asarray(orig), np.asarray(annot)


class DuckietownEnv(Simulator):
    """(velocity, steering) action interface (envs/duckietown_env.py:9-84)."""

    def __init__(self, *, gain=1.0, trim=0.0, radius=0.0318, k=27.0,
                 limit=1.0, **kw):
        self.gain, self.trim, self.radius = gain, trim, radius
        self.k, self.limit = k, limit
        super().__init__(**kw)

    def step(self, action):
        vel, steering = float(action[0]), float(action[1])
        duty = np.asarray(physics.wheel_duty_from_action(
            vel, steering, gain=self.gain, trim=self.trim,
            radius=self.radius, k=self.k, limit=self.limit))
        return super().step(duty)
