"""Config-driven domain randomization sampler."""
import json

import numpy as np

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
        assert 0 <= int(out["horz_mode"]) <= 4
        assert 1 <= int(out["frame_skip"]) <= 2
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
