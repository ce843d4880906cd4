"""Per-consumer breakdown of the fused-Pallas FCDenseNet TRAIN path
(models/tiramisu_train_pallas.py) — the measurement behind the
``--pallas_train`` >=2x-XLA-at-b128 target (VERDICT r02 item #5).

Method (same honest harness as cli/serve_breakdown.py): run one real
``pallas_apply_train`` forward with the fused consumer entry point
monkeypatched to RECORD each call, then re-time every recorded call
standalone — forward AND standalone VJP (value_and_grad of a scalar of
its output w.r.t. all differentiable inputs) — as K-iteration on-device
``lax.scan`` dispatches.  Alongside: the full forward, the full
forward+backward, and the full trainer ``train_step`` (augment +
fwd/bwd + loss chain + AdamW), so the gap attributable to XLA glue
(per-segment stats, folds, dropout masks, pool, transition-up, head,
loss, optimizer) is explicit at each nesting level.
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from . import common
from .serve_breakdown import _time_scan


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="67", choices=["67", "57", "103"])
    p.add_argument("-b", "--batch_size", type=int, default=128)
    p.add_argument("--peak_tflops", type=float, default=197.0)
    args = p.parse_args(args)
    common.setup_runtime()

    import jax
    import jax.numpy as jnp

    from ..core.dtypes import DEFAULT_POLICY
    from ..models import tiramisu_train_pallas as ttp
    from ..models.tiramisu import fcdensenet57, fcdensenet67, fcdensenet103
    from ..train.supervised import SupervisedTrainer
    from .test import build_model

    model = {"57": fcdensenet57, "67": fcdensenet67,
             "103": fcdensenet103}[args.arch](4, policy=DEFAULT_POLICY)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal(
        (args.batch_size, 120, 160, 3)).astype(np.float32))
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 120, 160, 3), jnp.float32))
    variables = jax.block_until_ready(variables)

    # -- record every fused consumer call from one real forward ------------
    calls = []
    real = ttp._consumer

    def recorder(cfg, segs, scale, shift, wf, bias, mask):
        out = real(cfg, segs, scale, shift, wf, bias, mask)
        calls.append((cfg, [jax.lax.stop_gradient(s) for s in segs],
                      jax.lax.stop_gradient(scale),
                      jax.lax.stop_gradient(shift),
                      jax.lax.stop_gradient(wf),
                      jax.lax.stop_gradient(bias),
                      jax.lax.stop_gradient(mask)))
        return out

    ttp._consumer = recorder
    try:
        jax.block_until_ready(ttp.pallas_apply_train(
            model, variables, x, jax.random.key(1), use_softmax=False))
    finally:
        ttp._consumer = real

    rows, t_fwd_sum, t_vjp_sum = [], 0.0, 0.0
    for cfg, segs, scale, shift, wf, bias, mask in calls:
        segs = jax.block_until_ready(segs)

        def fwd(*a):
            # segs as a tuple — the custom_vjp bwd rule returns a tuple
            n = len(cfg.seg_chans)
            return real(cfg, a[:n], *a[n:])

        arg = (*segs, scale, shift, wf, bias, mask)
        dt_f, fl_f = _time_scan(fwd, arg, with_floor=True)
        dt_f = max(dt_f - fl_f, 1e-9)

        def vjp(*a):
            def s(*aa):
                return jnp.sum(fwd(*aa).astype(jnp.float32) ** 2)
            return jax.value_and_grad(s, argnums=tuple(range(len(a))))(*a)

        dt_b, fl_b = _time_scan(vjp, arg, with_floor=True)
        dt_b = max(dt_b - fl_b, 1e-9)
        t_fwd_sum += dt_f
        t_vjp_sum += dt_b
        c_in = sum(cfg.seg_chans)
        pix = cfg.h * cfg.w
        flops = 2 * cfg.taps * cfg.g_out * c_in * pix * args.batch_size
        rows.append({
            "level": f"{cfg.h}x{cfg.w} c_in={c_in} taps={cfg.taps} "
                     f"g={cfg.g_out}",
            "fwd_ms": round(dt_f * 1e3, 3),
            "vjp_ms": round(dt_b * 1e3, 3),
            "gflop": round(flops / 1e9, 1),
            "fwd_mxu_pct": round(
                100 * flops / dt_f / 1e12 / args.peak_tflops, 1),
        })

    def full_fwd(xx):
        out, _ = ttp.pallas_apply_train(model, variables, xx,
                                        jax.random.key(1),
                                        use_softmax=False)
        return out

    dt_full, fl = _time_scan(full_fwd, (x,), with_floor=True)
    dt_full = max(dt_full - fl, 1e-9)

    def full_bwd(xx):
        def loss(params):
            out, _ = ttp.pallas_apply_train(
                model, {"params": params,
                        "batch_stats": variables["batch_stats"]},
                xx, jax.random.key(1), use_softmax=False)
            return jnp.mean(out.astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(variables["params"])

    dt_fb, fl = _time_scan(full_bwd, (x,), k=4, with_floor=True)
    dt_fb = max(dt_fb - fl, 1e-9)

    trainer = SupervisedTrainer(num_cls=4, augment=True,
                                model=build_model(args.arch, 4),
                                pallas_train=True)
    state = trainer.init_state(jax.random.key(0))
    imgs = jax.device_put(rng.integers(
        0, 255, (args.batch_size, 120, 160, 3), dtype=np.uint8))
    lbls = jax.device_put(rng.integers(
        0, 4, (args.batch_size, 120, 160), dtype=np.uint8))

    def full_step(im, lb):
        st, logs = trainer.train_step(state, im, lb, jax.random.key(2),
                                      jnp.float32(1e-3))
        # return the updated state too: _time_scan's consumption covers
        # every output leaf, so the backward + optimizer apply cannot be
        # dead-coded (returning only the loss deleted them — the
        # "67 ms" b128 step of the unfixed harness was forward-only)
        return logs["tr_loss"], st.params

    dt_step, fl = _time_scan(full_step, (imgs, lbls), k=4, with_floor=True)
    dt_step = max(dt_step - fl, 1e-9)

    print("\nNOTE: every row is floor-subtracted — a per-level "
          "calibration scan (same rolls + input consumption, kernel "
          "elided) removes the relay dispatch/fetch overhead and the "
          "harness's anti-CSE copies, so per-consumer rows are "
          "meaningful down to ~0.1 ms; the residual harness cost in a "
          "row is ~one HBM read of that level's outputs (for vjp rows: "
          "of the gradients).")
    print(f"\n{'consumer':34s} {'fwd ms':>8s} {'vjp ms':>8s} "
          f"{'GFLOP':>7s} {'fwdMXU%':>7s}")
    for r in rows:
        print(f"{r['level']:34s} {r['fwd_ms']:8.3f} {r['vjp_ms']:8.3f} "
              f"{r['gflop']:7.1f} {r['fwd_mxu_pct']:7.1f}")
    print(f"{'sum of consumers':34s} {t_fwd_sum*1e3:8.3f} "
          f"{t_vjp_sum*1e3:8.3f}")
    print(f"full fwd {dt_full*1e3:.3f} ms  (glue "
          f"{(dt_full - t_fwd_sum)*1e3:.3f} ms)")
    print(f"full fwd+bwd {dt_fb*1e3:.3f} ms")
    print(f"full train_step {dt_step*1e3:.3f} ms "
          f"({args.batch_size/dt_step:,.0f} img/s)")
    result = {"levels": rows, "fwd_sum_ms": t_fwd_sum * 1e3,
              "vjp_sum_ms": t_vjp_sum * 1e3, "full_fwd_ms": dt_full * 1e3,
              "full_fwd_bwd_ms": dt_fb * 1e3, "step_ms": dt_step * 1e3,
              "img_s": args.batch_size / dt_step}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
