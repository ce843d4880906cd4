"""TPE proposer (train/bayesopt.py) — the BayesOptSearch-parity gate:
the proposer must beat random sampling on a seeded synthetic objective
(VERDICT r1 item 7), plus the tune CLI smoke with --search tpe."""
import numpy as np
import pytest

from sim2real_lane_segment_tpu.train.bayesopt import (RandomProposer,
                                                      TPEProposer,
                                                      make_proposer)

SPACE = {"log_lr": (-4.0, -2.0), "log_lrRatio": (-3.0, 0.0),
         "log_decay": (-8.0, -1.0)}


def objective(cfg, rng):
    """Peaked at (-3.2, -1.0, -4.5) with mild observation noise."""
    return (-(cfg["log_lr"] + 3.2) ** 2
            - 0.5 * (cfg["log_lrRatio"] + 1.0) ** 2
            - 0.1 * (cfg["log_decay"] + 4.5) ** 2
            + 0.05 * rng.normal())


def run_search(proposer, n, seed):
    rng = np.random.default_rng(seed)
    best = -np.inf
    for _ in range(n):
        cfg = proposer.propose()
        y = objective(cfg, rng)
        proposer.observe(cfg, y)
        best = max(best, y)
    return best


def test_tpe_beats_random():
    n = 40
    wins = 0
    for seed in (0, 1, 2):
        tpe = run_search(TPEProposer(SPACE, seed=seed), n, seed=100 + seed)
        rnd = run_search(RandomProposer(SPACE, seed=seed), n, seed=100 + seed)
        wins += tpe >= rnd
    assert wins >= 2, f"TPE won only {wins}/3 seeded runs"


def test_tpe_concentrates_near_optimum():
    tpe = TPEProposer(SPACE, seed=0, n_startup=10)
    rng = np.random.default_rng(7)
    for _ in range(60):
        cfg = tpe.propose()
        tpe.observe(cfg, objective(cfg, rng))
    late = [tpe.propose() for _ in range(10)]
    lrs = np.array([c["log_lr"] for c in late])
    assert np.abs(lrs + 3.2).mean() < 0.5, lrs


def test_proposals_stay_in_bounds():
    for kind in ("tpe", "random"):
        prop = make_proposer(kind, SPACE, seed=3)
        rng = np.random.default_rng(3)
        for _ in range(30):
            cfg = prop.propose()
            for k, (lo, hi) in SPACE.items():
                assert lo <= cfg[k] <= hi, (kind, k, cfg)
            prop.observe(cfg, objective(cfg, rng))


def test_make_proposer_rejects_unknown():
    with pytest.raises(ValueError):
        make_proposer("gp", SPACE)


@pytest.mark.slow
def test_tune_cli_smoke(tmp_path, rng):
    """2-trial, 2-epoch sweep over tiny synthetic MME data with TPE."""
    from helpers import make_simreal_tree

    from sim2real_lane_segment_tpu.cli import tune

    root = make_simreal_tree(tmp_path, rng)
    out = tune.main(["--dataPath", root, "--reproducible",
                     "--num_samples", "2", "--num_epochs", "2",
                     "--grace_period", "1", "--arch", "tiny",
                     "--batch_size", "4", "--search", "tpe",
                     "--out_dir", str(tmp_path / "tune_out")])
    assert "best_config" in out
    for k, (lo, hi) in tune.SEARCH_SPACE.items():
        assert lo <= out["best_config"][k] <= hi
