"""Multi-process data parallelism through the PRODUCTION CLI on a REAL
dataset tree (closing VERDICT r01's gap: the multihost harness fed
synthetic batches, not the real DataModules).

Launches `s2r-train --trainType st --dp auto` as a genuine 2-process
jax.distributed cluster (gloo over localhost, 2 virtual CPU devices per
process) over a real on-disk simRealData tree.  Each process reads its
deterministic sampler shard (data/samplers.shard via cli/train.py's
process plumbing); gates:

- both processes log the identical train-loss stream (the loss is a
  replicated global scalar), and
- the stream matches a single-process run whose batch_size equals the
  2-process GLOBAL batch on the same device count (the shard streams
  compose to the global stream — data/samplers.py).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from helpers import make_simreal_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W = 24, 32


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(local_devices, coord=None, num=None, pid=None):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""      # never claim the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    if coord is not None:
        env["JAX_COORDINATOR_ADDRESS"] = coord
        env["JAX_NUM_PROCESSES"] = str(num)
        env["JAX_PROCESS_ID"] = str(pid)
    return env


def _launch(argv, env):
    return subprocess.Popen(
        [sys.executable, "-m", "sim2real_lane_segment_tpu.cli.train", *argv],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def _losses(out_dir):
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    return ([(r["step"], r["train/tr_loss"]) for r in rows
             if "train/tr_loss" in r],
            [r["val/iou"] for r in rows if "val/iou" in r])


@pytest.mark.slow
def test_train_cli_two_process_real_datamodule(tmp_path, rng):
    root = make_simreal_tree(tmp_path, rng, n_source=8, n_target=4,
                             n_unlabelled=16, n_test=4)
    out_root = str(tmp_path / "out")
    coord = f"127.0.0.1:{_free_port()}"

    def argv(batch, name):
        return ["--trainType", "st", "--dataPath", root, "--dp", "auto",
                "--arch", "tiny", "--max_epochs", "1",
                "--batch_size", str(batch), "--width", str(W),
                "--height", str(H), "--model_name", name,
                "--default_root_dir", out_root, "--log_every", "1"]

    procs = [_launch(argv(4, "mp"), _env(2, coord, 2, pid))
             for pid in (0, 1)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"

    # rank 0 writes the canonical dir; rank 1 a scratch subdir
    tr0, val0 = _losses(os.path.join(out_root, "mp"))
    tr1, val1 = _losses(os.path.join(out_root, "mp", "proc1"))
    assert tr0 == tr1            # replicated global scalar: identical logs
    np.testing.assert_allclose(val0, val1, rtol=0, atol=0)

    # single process, same 4 global devices, batch = the 2-process GLOBAL
    # batch (2 procs x batch 4): same sampler stream, same loss trajectory
    ref = _launch(argv(8, "sp"), _env(4))
    out, err = ref.communicate(timeout=600)
    assert ref.returncode == 0, f"single-process run failed:\n{err[-3000:]}"
    tr_ref, val_ref = _losses(os.path.join(out_root, "sp"))
    assert [s for s, _ in tr_ref] == [s for s, _ in tr0]
    np.testing.assert_allclose([v for _, v in tr0], [v for _, v in tr_ref],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(val0, val_ref, rtol=1e-3, atol=1e-2)
