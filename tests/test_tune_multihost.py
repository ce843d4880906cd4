"""Multi-host HPO trial sharding, actually executed on 2 processes.

Launches a real 2-process jax.distributed cluster (gloo over localhost,
CPU-forced) where each process runs ``cli.tune`` over the SAME sweep;
trials shard round-robin by process index (cli/tune.py:133-137).  Gates:

- both hosts complete and write ``host_{i}/best.json``;
- the trial directories are disjoint and cover the full sample set
  (host 0 runs even trial ids, host 1 odd) — the working version of the
  reference's Ray-actor trial parallelism (tune.py:82-98).
"""
import json
import os
import pytest
import socket
import subprocess
import sys

pytestmark = pytest.mark.slow  # multi-minute gate: subprocess cluster / end-to-end study

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_tune_shards_trials(tmp_path, rng):
    from helpers import make_simreal_tree

    root = make_simreal_tree(tmp_path, rng)
    out_dir = str(tmp_path / "tune_mh")
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["PALLAS_AXON_POOL_IPS"] = ""   # never claim the TPU tunnel
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "sim2real_lane_segment_tpu.cli.tune",
             "--dataPath", root, "--reproducible",
             "--num_samples", "2", "--num_epochs", "1",
             "--grace_period", "1", "--arch", "tiny",
             "--batch_size", "4", "--search", "tpe",
             "--out_dir", out_dir],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))

    for pid, proc in enumerate(procs):
        out, err = proc.communicate(timeout=900)
        assert proc.returncode == 0, f"host {pid} failed:\n{err[-3000:]}"

    seen = {}
    for pid in range(2):
        host_dir = os.path.join(out_dir, f"host_{pid}")
        with open(os.path.join(host_dir, "best.json")) as f:
            best = json.load(f)
        assert best["best_iou"] > 0
        trials = sorted(int(d.split("_")[1]) for d in os.listdir(host_dir)
                        if d.startswith("trial_"))
        seen[pid] = trials
    assert seen[0] == [0] and seen[1] == [1], seen
