"""NPC dynamics: lane-following duckiebot, pedestrian patrol, traffic light."""
import numpy as np

import jax

from sim2real_lane_segment_tpu.sim import lanes, npc
from sim2real_lane_segment_tpu.sim.maps import builtin_map, load_map_dict
from sim2real_lane_segment_tpu.sim.rollout import sample_spawns


def test_duckiebot_npc_follows_lane():
    m = builtin_map("small_loop")
    la = lanes.build_lane_arrays(m)
    rng = np.random.default_rng(0)
    pos, angle = sample_spawns(m, la, rng, 1)
    bot = npc.DuckiebotNPC(pos=np.asarray(pos[0]), angle=float(angle[0]),
                           obj_index=0)
    for _ in range(150):
        bot.step(la, m.tile_size, 1.0 / 30.0)
        lp = jax.device_get(lanes.lane_pos(
            la, m.tile_size, bot.pos, bot.angle))
        assert bool(lp.in_lane), f"npc left lane at {bot.pos}"


def test_pedestrian_patrols_and_reverses():
    ped = npc.DuckiePedestrian(start=np.array([0.0, 0.0]),
                               end=np.array([0.4, 0.0]),
                               speed=0.4, pause_steps=2, obj_index=0)
    xs = []
    for _ in range(200):
        ped.step(1.0 / 30.0)
        xs.append(ped.pos[0])
    xs = np.asarray(xs)
    assert xs.max() <= 0.4 + 1e-6 and xs.min() >= -1e-6
    # it must reach both ends (patrol, not drift)
    assert xs.max() > 0.39 and xs.min() < 0.01
    # direction reverses at least twice
    assert (np.abs(np.diff(np.sign(np.diff(xs)))) > 0).sum() >= 2


def test_traffic_light_period():
    tl = npc.TrafficLight(period_steps=5, obj_index=0)
    states = []
    for _ in range(20):
        states.append(tl.is_green)
        tl.step()
    assert states[:5] == [True] * 5
    assert states[5:10] == [False] * 5


def test_env_with_dynamic_objects():
    mdata = {
        "tile_size": 0.585,
        "tiles": [["curve_left/E", "straight/E", "curve_left/N"],
                  ["straight/S", "asphalt", "straight/N"],
                  ["curve_left/S", "straight/W", "curve_left/W"]],
        "objects": [
            {"kind": "duckie", "pos": [1.5, 1.5], "rotate": 0,
             "height": 0.08, "static": False},
            {"kind": "trafficlight", "pos": [1.5, 1.2], "rotate": 0,
             "height": 0.3},
        ],
    }
    from sim2real_lane_segment_tpu.sim.env import Simulator
    m = load_map_dict("npc_map", mdata)
    env = Simulator(map_obj=m, camera_width=80, camera_height=60,
                    domain_rand=False, seed=0, max_steps=50)
    objs0 = np.asarray(env.scene.objects).copy()
    for _ in range(30):
        _, _, done, _ = env.step([0.2, 0.2])
        if done:
            env.reset()
    objs1 = np.asarray(env.scene.objects)
    # pedestrian moved; traffic light color flipped at some point
    assert not np.allclose(objs0[0, :2], objs1[0, :2])
