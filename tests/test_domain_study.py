"""domain_study CLI: regime-level crash-resume.

The study is a multi-hour matrix on a shared chip; a crash must lose at
most one regime.  These tests pre-build the workdir's domain trees (so
``_record_domain`` takes its cached-early-return, domain_study.py:50-52)
and drive main() twice: the rerun must skip finished regimes and keep
their numbers.
"""
import json
import os

import numpy as np
import pytest

from helpers import write_split


pytestmark = pytest.mark.slow  # multi-minute gate: subprocess cluster / end-to-end study

@pytest.fixture
def workdir(tmp_path):
    rng = np.random.default_rng(0)
    for dom in ("sourceData", "targetData"):
        for split, n in (("train", 12), ("valid", 4), ("test", 4)):
            write_split(str(tmp_path / dom / split), n, rng)
    return tmp_path


def _run(workdir, regimes, extra=()):
    from sim2real_lane_segment_tpu.cli import domain_study
    return domain_study.main(
        ["--workdir", str(workdir), "--arch", "tiny", "--epochs", "1",
         "--n_labelled", "2", "-b", "4", "--regimes", *regimes, *extra])


def test_resume_skips_finished_regimes(workdir):
    r1 = _run(workdir, ["baseline"])
    assert "baseline" in r1
    summary = workdir / "study_summary.json"
    assert json.loads(summary.read_text())["baseline"] == r1["baseline"]

    # poison the summary: a rerun must keep the recorded value untouched
    # (proving it skipped the fit), and add only the new regime
    fake = dict(r1["baseline"], iou=99.0)
    summary.write_text(json.dumps({"baseline": fake}))
    r2 = _run(workdir, ["baseline", "st"])
    assert r2["baseline"]["iou"] == 99.0
    assert "st" in r2
    assert set(json.loads(summary.read_text())) == {"baseline", "st"}


def test_mme_restores_baseline_weights_without_refit(workdir):
    _run(workdir, ["baseline"])
    # drop the summary but keep the trained weights: mme must restore
    # results/baseline/best_weights.msgpack instead of refitting, and
    # re-evaluation must reproduce the summary numbers
    prev = json.loads((workdir / "study_summary.json").read_text())
    os.remove(workdir / "study_summary.json")
    r = _run(workdir, ["mme"])
    assert r["baseline"]["iou"] == pytest.approx(prev["baseline"]["iou"],
                                                 abs=1e-6)
    assert "mme" in r
    assert os.path.exists(workdir / "results" / "mme" /
                          "best_weights.msgpack")


def test_force_retrains(workdir):
    _run(workdir, ["baseline"])
    summary = workdir / "study_summary.json"
    fake = {"baseline": {"loss": 0, "acc": 0, "dice": 0, "iou": 99.0}}
    summary.write_text(json.dumps(fake))
    r = _run(workdir, ["baseline"], extra=["--force"])
    assert r["baseline"]["iou"] != 99.0


def test_device_cache_disabled_after_repeated_crashes(workdir):
    """regime_cache: the per-regime attempt marker disables the device
    cache from the third entry on (crash-restart HBM relief that
    persists across processes, domain_study.regime_cache)."""
    for i in range(3):
        _run(workdir, ["baseline"], extra=("--device_cache", "--force"))
    marker = workdir / "results" / "baseline" / "cache_attempts.txt"
    assert marker.read_text().strip() == "3"
    # the third run logged+trained without the cache; the study still
    # produced a result
    assert "baseline" in json.loads(
        (workdir / "study_summary.json").read_text())
