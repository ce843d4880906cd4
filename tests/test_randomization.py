"""Config-driven domain randomization sampler."""
import json

import numpy as np
import pytest

import jax

from sim2real_lane_segment_tpu.sim.randomization import (
    DEFAULT_DR_CONFIG, Randomizer)


def test_randomize_draws_all_keys():
    r = Randomizer()
    out = r.randomize(jax.random.key(0))
    assert set(out) == set(DEFAULT_DR_CONFIG)
    assert out["light_pos"].shape == (3,)
    assert out["frame_skip"].shape == ()


def test_ranges_respected():
    r = Randomizer()
    for seed in range(20):
        out = r.randomize(jax.random.key(seed))
        # int draws use EXCLUSIVE high (reference randomizer.py:41)
        assert 0 <= int(out["horz_mode"]) <= 3
        assert int(out["frame_skip"]) == 1  # reference (1,2) quirk
        v = np.asarray(out["light_scale"])
        assert (v >= 0.75).all() and (v <= 1.15).all()


def test_deterministic_per_key():
    r = Randomizer()
    a = r.randomize(jax.random.key(3))
    b = r.randomize(jax.random.key(3))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_custom_config_file(tmp_path):
    cfg = {"foo": {"type": "uniform", "low": 2.0, "high": 2.0},
           "bar": {"type": "normal", "loc": 5.0, "scale": 0.0}}
    p = tmp_path / "dr.json"
    p.write_text(json.dumps(cfg))
    r = Randomizer(randomization_config_fp=str(p))
    out = r.randomize(jax.random.key(0))
    assert float(out["foo"]) == 2.0
    assert float(out["bar"]) == 5.0


def test_defaults_are_deterministic():
    r = Randomizer()
    d = r.defaults()
    assert float(d["camera_noise"]) == 0.0


# ---------------------------------------------------------------------------
# wiring: Randomizer -> DRParams -> renderer / env (VERDICT r1 item 4)
# ---------------------------------------------------------------------------

def test_drparams_from_randomizer_draws():
    from sim2real_lane_segment_tpu.sim.render import DRParams
    r = Randomizer()
    dr = DRParams.sample(jax.random.key(0), r)
    assert dr.light_pos.shape == (3,)
    assert 0 <= int(dr.horz_mode) <= 3
    assert int(dr.frame_skip) >= 1
    # defaults path mirrors the default-config JSON
    d0 = DRParams.from_draws(r.defaults())
    np.testing.assert_allclose(np.asarray(d0.light_pos), [-40, 200, 100])
    assert float(d0.noise_sigma) == 0.0


def test_config_change_alters_rendered_frame(tmp_path):
    """A config-file change must visibly alter rendered frames: pin the
    light low on the horizon + dark horizon mode vs the defaults."""
    import json

    from sim2real_lane_segment_tpu.sim import render
    from sim2real_lane_segment_tpu.sim.maps import builtin_map

    cfg = {"light_pos": {"type": "uniform", "low": [200, 20, 0],
                         "high": [200, 20, 0], "size": 3},
           "horz_mode": {"type": "int", "low": 2, "high": 3}}
    p = tmp_path / "dr.json"
    p.write_text(json.dumps(cfg))
    r = Randomizer(randomization_config_fp=str(p))
    dr_custom = render.DRParams.sample(jax.random.key(0), r)
    dr_default = render.DRParams.default()

    scene = render.build_scene(builtin_map("small_loop"), seed=0)
    import jax.numpy as jnp
    pos, ang = jnp.asarray([0.29 * 0.585, 1.5 * 0.585]), jnp.asarray(np.pi / 2)
    a = np.asarray(render.render_frame(scene, pos, ang, dr_default,
                                       jax.random.key(1), height=60, width=80))
    b = np.asarray(render.render_frame(scene, pos, ang, dr_custom,
                                       jax.random.key(1), height=60, width=80))
    # sky swapped to the dark mode AND ground darkened by the low light
    assert b[:5].mean() < a[:5].mean() - 50, "horz_mode did not change sky"
    assert b[-5:].mean() < a[-5:].mean() - 2, "light_pos did not dim ground"


def test_env_consumes_dr_frame_skip(tmp_path):
    """DR frame_skip replaces the configured skip (simulator.py:1363-69):
    forcing frame_skip=3 must move the agent ~3x farther per step."""
    import json

    from sim2real_lane_segment_tpu.sim.env import Simulator

    cfg = {"frame_skip": {"type": "int", "low": 3, "high": 4}}
    p = tmp_path / "dr.json"
    p.write_text(json.dumps(cfg))
    kw = dict(map_name="straight_road", camera_width=32, camera_height=24,
              max_steps=50)
    env1 = Simulator(seed=1, domain_rand=False, **kw)
    env3 = Simulator(seed=1, domain_rand=True,
                     randomization_config_fp=str(p), **kw)
    assert int(env3.dr.frame_skip) == 3

    def travel(env):
        p0 = env.cur_pos.copy()
        env.step(np.asarray([0.5, 0.5], np.float32))
        return float(np.linalg.norm(env.cur_pos - p0))

    d1, d3 = travel(env1), travel(env3)
    assert d3 == pytest.approx(3 * d1, rel=0.05)
