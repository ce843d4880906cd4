"""Per-level breakdown + roofline of the fused-Pallas FCDenseNet serving
forward (models/tiramisu_pallas.py) — the measurement behind the
10k-fps north-star close-out (BASELINE.md addendum).

Method: run one real ``pallas_apply`` forward with the fused-block entry
point monkeypatched to RECORD each call's inputs/config, then re-time
every recorded call standalone as a K-iteration on-device ``lax.scan``
(one dispatch; the dev relay's ~1.3 ms/dispatch would otherwise swamp
sub-ms levels).  For each level it reports measured ms/batch next to the
analytic MXU FLOPs and HBM bytes (segments in + output out — inter-layer
activations stay in VMEM by construction), so the bound each level sits
against is explicit.  The full forward is timed the same way; the gap
between sum-of-levels and the full graph is the XLA glue (transitions,
pools, layout transposes).
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

from . import common


def _time_scan(fn, args, k=8, iters=4, with_floor=False):
    """Mean seconds per fn(*args) via an L=k*iters-pass on-device scan.

    Harness design (each clause closes a measured failure mode — see
    QUIRKS.md "measurement traps"):

    * ONE dispatch of length L, closed by a VALUE fetch — not
      block_until_ready(): under the dev relay's async mode
      block_until_ready returns before the work runs (measured: a
      2.8 ms matmul scan "completing" in 5 us), and each extra
      dispatch+fetch pays a full relay roundtrip that inflates short
      measurements (ADVICE r04: iters are folded INTO the scan length
      rather than looped on the host).
    * Each pass's inputs are rolled along axis 0 by a carry-derived
      runtime shift (0 or 1 — never provable at compile time, for ANY
      input dtype), so XLA can neither hoist the body out of the scan
      nor CSE the passes.
    * Every output leaf is consumed through ``abs`` — NOT a bare
      ``jnp.sum``: the simplifier rewrites pure sum(A@B) into an
      O(n^2) row/col contraction, algebraically deleting the matmul
      being timed (ADVICE r04); abs blocks the reassociation.  And the
      per-row sums are weighted by a position-dependent vector before
      the final reduction, so sum-of-roll cannot be rewritten as
      sum (a permutation-invariant reduction would let the simplifier
      drop the roll, silently removing the harness's anti-CSE copy
      from the calibration scan below).  Consumption must cover EVERY
      output element: reading one element lets XLA dead-code the rest
      (train_breakdown's 234 ms train step read as 67 ms of
      forward-only under the pre-r4 harness).
    * The real scan and a CALIBRATION scan (same rolls, same input
      consumption, ``fn`` elided) both run when ``with_floor`` is set;
      the caller gets (dt_real, dt_floor) and can report
      floor-subtracted rows.  Both scans consume the rolled INPUTS so
      the floor term is common-mode; the real scan's extra cost over
      ``t_fn`` is then one HBM read of fn's outputs.
    """
    import jax
    import jax.numpy as jnp

    L = k * iters

    def consume(tree):
        tot = np.float32(0.0)
        for l in jax.tree_util.tree_leaves(tree):
            a = jnp.abs(l.astype(jnp.float32))
            if a.ndim == 0:
                tot = tot + a
                continue
            rows = jnp.sum(a, axis=tuple(range(1, a.ndim)))
            w = (jnp.arange(rows.shape[0], dtype=jnp.float32) + 1.0)
            tot = tot + jnp.vdot(rows, w)
        return tot

    def make_loop(run_fn):
        @jax.jit
        def loop(xs):
            def body(c, _):
                sh = c.astype(jnp.int32) & 1  # runtime 0, not foldable
                xs2 = jax.tree_util.tree_map(
                    lambda a: jnp.roll(a, sh, axis=0) if a.ndim else a, xs)
                tot = consume(xs2)
                if run_fn:
                    tot = tot + consume(fn(*xs2))
                return c + tot * np.float32(1e-30), None
            return jax.lax.scan(body, np.float32(0.0), None, length=L)[0]
        return loop

    def timed(loop):
        s = float(loop(args))  # warmup/compile
        t0 = time.perf_counter()
        s += float(loop(args))
        dt = (time.perf_counter() - t0) / L
        assert np.isfinite(s)
        return dt

    dt = timed(make_loop(True))
    if not with_floor:
        return dt
    return dt, timed(make_loop(False))


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="67", choices=["67", "57", "103"])
    p.add_argument("-b", "--batch_size", type=int, default=256)
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="chip bf16 peak (v5e: 197 TFLOP/s)")
    p.add_argument("--peak_gbps", type=float, default=819.0,
                   help="chip HBM bandwidth (v5e: 819 GB/s)")
    p.add_argument("--ablate", default=None, metavar="SUBSTR",
                   help="empirical VPU-floor decomposition: for each "
                        "recorded level whose name contains SUBSTR, also "
                        "time the kernel with (a) the 9-tap reduction "
                        "replaced by a single-tap copy ('no_taps') and "
                        "(b) the per-layer BN/ReLU/mask feed removed "
                        "('no_prep') — wrong math, right timing; the "
                        "deltas attribute each level's time to the two "
                        "named VPU costs (VERDICT r03 item #2)")
    args = p.parse_args(args)
    common.setup_runtime()

    import jax
    import jax.numpy as jnp

    from ..core.dtypes import DEFAULT_POLICY
    from ..models import tiramisu_pallas as tp
    from ..models.tiramisu import (fcdensenet57, fcdensenet67, fcdensenet103)
    from ..ops.augment import AugmentConfig, eval_batch

    model = {"57": fcdensenet57, "67": fcdensenet67,
             "103": fcdensenet103}[args.arch](4, policy=DEFAULT_POLICY)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 120, 160, 3), jnp.float32))
    imgs = np.random.default_rng(0).integers(
        0, 255, (args.batch_size, 120, 160, 3), dtype=np.uint8)
    cfg = AugmentConfig()
    x, _ = eval_batch(jnp.asarray(imgs), None, cfg, with_labels=False)

    # -- record every fused-block call from one real forward ---------------
    calls = []
    real = tp.fused_dense_block_cm

    def recorder(segments, folded, **kw):
        out = real(segments, folded, **kw)
        calls.append((jax.tree_util.tree_map(lambda a: a, segments),
                      folded, dict(kw)))
        return out

    tp.fused_dense_block_cm = recorder
    try:
        jax.block_until_ready(tp.pallas_apply(model, variables, x,
                                              use_softmax=False))
    finally:
        tp.fused_dense_block_cm = real

    # -- time each level + compute its analytic bounds ---------------------
    itemsize = jnp.dtype(model.policy.compute_dtype).itemsize
    rows, t_sum = [], 0.0
    for segments, folded, kw in calls:
        h, w, n, g = kw["h"], kw["w"], kw["n_layers"], kw["growth"]
        fn = functools.partial(real, folded=folded, **kw)
        dt, dt_floor = _time_scan(lambda *s: fn(list(s)), tuple(segments),
                                  with_floor=True)
        dt = max(dt - dt_floor, 1e-9)
        t_sum += dt
        c_in = sum(s.shape[1] for s in segments)
        pix = h * w
        # MXU: per layer j one kn2row GEMM [9g, c_j] @ [c_j, P]
        flops = sum(2 * 9 * g * (c_in + j * g) * pix
                    for j in range(n)) * args.batch_size
        if kw.get("transition") is not None:
            c_t = c_in + n * g
            flops += 2 * c_t * c_t * pix * args.batch_size
        if kw.get("classifier") is not None:
            c_t = c_in + n * g
            flops += 2 * 8 * c_t * pix * args.batch_size
        # HBM: segments in + outputs out; VMEM holds everything between
        out_c = (8 if kw.get("classifier") is not None
                 else (c_in + n * g) - kw["c_lo"])
        bytes_hbm = (c_in + out_c) * pix * itemsize * args.batch_size
        if kw.get("transition") is not None:
            bytes_hbm += (c_in + n * g) * pix * itemsize * args.batch_size
        name = (f"{h}x{w} c_in={c_in} n={n}"
                + (" +TD" if kw.get("transition") is not None else "")
                + (" +cls" if kw.get("classifier") is not None else ""))
        abl = {}
        if args.ablate is not None and args.ablate in name:
            for mode in ("no_taps", "no_prep"):
                fn_a = functools.partial(real, folded=folded,
                                         ablate=mode, **kw)
                try:
                    dt_a, dt_af = _time_scan(lambda *s: fn_a(list(s)),
                                             tuple(segments),
                                             with_floor=True)
                except ValueError as e:  # tiled-path level: no ablation
                    print(f"ablate skipped for {name}: {e}")
                    break
                abl[mode + "_ms"] = round(max(dt_a - dt_af, 0.0) * 1e3, 3)
        rows.append({
            "level": name,
            "floor_ms": round(dt_floor * 1e3, 3),
            **abl,
            "ms": round(dt * 1e3, 3),
            "gflop": round(flops / 1e9, 1),
            "tflops": round(flops / dt / 1e12, 1),
            "mxu_pct": round(100 * flops / dt / 1e12 / args.peak_tflops, 1),
            "hbm_gb_s": round(bytes_hbm / dt / 1e9, 1),
            "hbm_pct": round(100 * bytes_hbm / dt / 1e9 / args.peak_gbps, 1),
        })

    def full(xx):
        return tp.pallas_apply(model, variables, xx, use_softmax=False)

    dt_full, dt_full_floor = _time_scan(full, (x,), with_floor=True)
    dt_full = max(dt_full - dt_full_floor, 1e-9)
    fps = args.batch_size / dt_full
    total_gf = sum(r["gflop"] for r in rows)

    print("\nNOTE: every row is floor-subtracted — a calibration scan "
          "with the same rolls and input consumption but the kernel "
          "elided is timed per level and its per-pass cost (printed as "
          "floor_ms) removed, so relay dispatch/fetch overhead and the "
          "harness's anti-CSE copies do not inflate sub-ms levels; the "
          "residual harness cost in a row is ~one HBM read of that "
          "level's outputs.")
    print(f"\n{'level':36s} {'ms':>8s} {'GFLOP':>8s} {'TF/s':>6s} "
          f"{'MXU%':>5s} {'HBM GB/s':>9s} {'HBM%':>5s}")
    for r in rows:
        print(f"{r['level']:36s} {r['ms']:8.3f} {r['gflop']:8.1f} "
              f"{r['tflops']:6.1f} {r['mxu_pct']:5.1f} {r['hbm_gb_s']:9.1f} "
              f"{r['hbm_pct']:5.1f}")
        if "no_taps_ms" in r:
            taps = r["ms"] - r["no_taps_ms"]
            prep = r["ms"] - r["no_prep_ms"]
            print(f"{'  ablations: 9-tap reduction':36s} {taps:8.3f}   "
                  f"({100 * taps / r['ms']:.0f}% of level)")
            print(f"{'  ablations: BN/ReLU/mask feed':36s} {prep:8.3f}   "
                  f"({100 * prep / r['ms']:.0f}% of level)")
    glue_ms = dt_full * 1e3 - t_sum * 1e3
    print(f"{'sum of fused levels':36s} {t_sum*1e3:8.3f}")
    print(f"{'full forward (incl. XLA glue)':36s} {dt_full*1e3:8.3f}   "
          f"glue {glue_ms:.3f} ms ({100*glue_ms/(dt_full*1e3):.0f}%)")
    print(f"throughput: {fps:,.0f} frames/s/chip at batch {args.batch_size}")
    print(f"compute-bound ceiling at 100% MXU: "
          f"{args.batch_size * args.peak_tflops * 1e12 / (total_gf*1e9/args.batch_size) / args.batch_size:,.0f} "
          f"frames/s ({total_gf/args.batch_size:.2f} GFLOP/frame)")
    result = {"fps": fps, "full_ms": dt_full * 1e3, "levels": rows,
              "glue_ms": glue_ms,
              "gflop_per_frame": total_gf / args.batch_size}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
