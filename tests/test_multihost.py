"""Genuine multi-process data parallelism: launches a real 2-process
jax.distributed cluster (gloo over localhost) running the framework's
supervised train step on a global mesh, and gates

- cross-process agreement: the replicated loss is identical on both
  processes, and
- single-process parity: the same global batch through one process with
  the same device count gives the same losses.

This is the working version of the reference's broken DDP
(rightLaneNetwork/README.md:275-277).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute gate: subprocess cluster / end-to-end study

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(argv, env):
    return subprocess.Popen(
        [sys.executable, "-m",
         "sim2real_lane_segment_tpu.parallel.multihost", *argv],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)


def _result(proc) -> dict:
    out, err = proc.communicate(timeout=420)
    assert proc.returncode == 0, f"worker failed:\n{err[-3000:]}"
    return json.loads(out.strip().splitlines()[-1])


def test_two_process_cluster_matches_single_process():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""   # never claim the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    common = ["--cpu", "--local_devices", "2", "--steps", "2",
              "--per_device_batch", "2"]
    w0 = _launch(["--process_id", "0", "--num_processes", "2",
                  "--coordinator", coord, *common], env)
    w1 = _launch(["--process_id", "1", "--num_processes", "2",
                  "--coordinator", coord, *common], env)
    r0, r1 = _result(w0), _result(w1)
    assert r0["global_devices"] == r1["global_devices"] == 4
    assert r0["local_devices"] == 2
    # the loss is a replicated global scalar: bitwise equal across hosts
    assert r0["losses"] == r1["losses"]

    # single process, same global device count and global batch
    ref = _result(_launch(["--process_id", "0", "--num_processes", "1",
                           "--cpu", "--local_devices", "4", "--steps", "2",
                           "--per_device_batch", "2"], env))
    assert ref["global_devices"] == 4
    np.testing.assert_allclose(ref["losses"], r0["losses"],
                               rtol=1e-5, atol=1e-6)
