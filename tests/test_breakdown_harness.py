"""Gates for the cli/serve_breakdown measurement harness (_time_scan).

The harness exists because the dev environment's TPU relay makes naive
timing lie (QUIRKS.md "measurement traps"); these tests gate the
anti-optimization properties the round-4 postmortem and ADVICE r04
require, on the CPU backend where the optimizer is the same XLA:

* with_floor returns (dt, floor) with a non-negative floor,
* the per-pass work is NOT hoisted/CSE'd/deleted across scan passes —
  net time scales with the amount of chained work per pass,
* every output leaf is forced — a fn whose large output is discarded by
  a partial reader would time as ~free; the harness's weighted-abs
  consumption keeps it paid for,
* the tiled-path ablate guard raises ValueError (not a strippable
  assert) — ADVICE r04.
"""
from __future__ import annotations

import numpy as np
import pytest


def test_time_scan_floor_api():
    from sim2real_lane_segment_tpu.cli.serve_breakdown import _time_scan
    import jax.numpy as jnp

    a = np.random.default_rng(0).standard_normal((16, 64)).astype(np.float32)

    def f(x):
        return jnp.maximum(x @ x.T, 0.0)

    dt = _time_scan(f, (a,), k=2, iters=2)
    assert dt > 0
    dt2, floor = _time_scan(f, (a,), k=2, iters=2, with_floor=True)
    assert dt2 > 0 and floor >= 0


def test_time_scan_work_scales_with_chain_length():
    """If XLA hoisted the body out of the scan, CSE'd the passes, or
    algebraically deleted the matmuls (the three failure modes the
    round-4 postmortem found), per-pass time would NOT grow ~linearly
    with the chained work inside fn.  relu between matmuls blocks
    reassociation; distinct per-pass inputs come from the harness."""
    from sim2real_lane_segment_tpu.cli.serve_breakdown import _time_scan
    import jax.numpy as jnp

    n = 512
    a = np.random.default_rng(1).standard_normal((n, n)).astype(np.float32)
    w = (np.random.default_rng(2).standard_normal((n, n))
         .astype(np.float32) * 0.01)

    def chain(reps):
        def f(x):
            y = x
            for _ in range(reps):
                y = jnp.maximum(y @ w, 0.0) + 1e-3
            return y
        return f

    t1, f1 = _time_scan(chain(2), (a,), k=4, iters=2, with_floor=True)
    t2, f2 = _time_scan(chain(16), (a,), k=4, iters=2, with_floor=True)
    net1, net2 = max(t1 - f1, 1e-9), max(t2 - f2, 1e-9)
    # 8x the work; demand >2.5x to stay robust to scheduling noise
    assert net2 / net1 > 2.5, (net1, net2)


def test_time_scan_output_not_dead_coded():
    """A fn returning a large matmul result must cost far more than a
    fn returning a tiny slice of the same input — if consumption read
    only one element XLA would slice the dot to one row and both would
    time alike (the pre-r4 train_breakdown defect)."""
    from sim2real_lane_segment_tpu.cli.serve_breakdown import _time_scan
    import jax.numpy as jnp

    n = 768
    a = np.random.default_rng(3).standard_normal((n, n)).astype(np.float32)

    def heavy(x):
        y = x
        for _ in range(8):
            y = jnp.maximum(y @ y, 0.0) * 1e-3
        return y

    def light(x):
        return x[:1, :1]

    th, fh = _time_scan(heavy, (a,), k=4, iters=2, with_floor=True)
    tl, fl = _time_scan(light, (a,), k=4, iters=2, with_floor=True)
    assert max(th - fh, 1e-9) > 3 * max(tl - fl, 1e-9), (th, fh, tl, fl)


def test_ablate_raises_on_tiled_path():
    """ADVICE r04: a ValueError (never a strippable assert) when ablate
    is requested for a level that falls to the tiled kernel path."""
    import jax.numpy as jnp

    from sim2real_lane_segment_tpu.models.tiramisu_pallas import (
        fused_dense_block_cm)

    h, w, c = 8, 16, 4
    seg = jnp.zeros((1, c, h * w), jnp.float32)
    folded = (jnp.ones((c, 1)), jnp.zeros((c, 1)),
              jnp.zeros((1, 9 * 2, c)), jnp.zeros((2, 1)))
    with pytest.raises(ValueError, match="packed-path-only"):
        # tile_rows != h forces the tiled path regardless of VMEM fit
        fused_dense_block_cm([seg], folded, n_layers=1, growth=2, c_lo=0,
                             h=h, w=w, tile_rows=h // 2, interpret=True,
                             ablate="no_taps")
