"""Measure the pallas TRAIN forward alone at a given batch.

Closes the one estimated quantity in the round-5 `--pallas_train`
floor argument (RESULTS.md): the full-step lower bound is ~3x the
forward's GEMM volume, and the b128 forward had never been measured
(round 4's b128 train_breakdown OOMed through its retries).  One
compile, one scan dispatch, floor-subtracted — same harness as
cli/train_breakdown.py's aggregate rows.

Usage: python scripts/fwd_probe.py [batch]
"""
import sys

from sim2real_lane_segment_tpu.cli import common

common.setup_logging()
common.setup_runtime()

import jax                                                  # noqa: E402
import jax.numpy as jnp                                     # noqa: E402
import numpy as np                                          # noqa: E402

from sim2real_lane_segment_tpu.cli.serve_breakdown import _time_scan  # noqa: E402
from sim2real_lane_segment_tpu.core.dtypes import DEFAULT_POLICY      # noqa: E402
from sim2real_lane_segment_tpu.models import tiramisu_train_pallas as ttp  # noqa: E402
from sim2real_lane_segment_tpu.models.tiramisu import fcdensenet67    # noqa: E402

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
model = fcdensenet67(4, policy=DEFAULT_POLICY)
rng = np.random.default_rng(0)
x = jax.device_put(rng.standard_normal(
    (batch, 120, 160, 3)).astype(np.float32))
variables = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, 120, 160, 3), jnp.float32))
variables = jax.block_until_ready(variables)


def fwd(xx):
    out, _ = ttp.pallas_apply_train(model, variables, xx,
                                    jax.random.key(1), use_softmax=False)
    return out


dt, floor = _time_scan(fwd, (x,), with_floor=True)
dt = max(dt - floor, 1e-9)
print({"metric": f"pallas_train_fwd_ms_b{batch}",
       "value": round(dt * 1e3, 2), "unit": "ms",
       "img_per_s": round(batch / dt, 1),
       "floor_ms": round(floor * 1e3, 3)})
