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


def _time_scan(fn, args, k=8, iters=4):
    """Mean seconds per fn(*args) via a K-pass on-device scan.

    Each pass's inputs are rolled along axis 0 by a carry-derived
    runtime shift (0 or 1 — never provable at compile time, for ANY
    input dtype), so XLA can neither hoist the loop-invariant
    computation out of the scan nor CSE the passes; the carry also
    consumes each output.  Consumption must cover EVERY output element:
    reading one element (the original ``leaf[0]``) lets XLA dead-code
    the rest — slicing a sliceable computation down to one dot-row, and
    deleting a discarded backward entirely (train_breakdown's 234 ms
    train step read as 67 ms of forward-only, its consumers as 0.005 ms
    at 18,000% MXU; opaque pallas_call levels were immune, which is why
    serve_breakdown's numbers cross-checked against bench.py anyway).
    A full jnp.sum per leaf forces the whole computation for ~free.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(xs):
        def body(c, _):
            sh = c.astype(jnp.int32) & 1  # runtime 0, not foldable
            xs2 = jax.tree_util.tree_map(
                lambda a: jnp.roll(a, sh, axis=0) if a.ndim else a, xs)
            out = fn(*xs2)
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            return c + tot * np.float32(1e-30), None
        return jax.lax.scan(body, np.float32(0.0), None, length=k)[0]

    # close every timing window with a VALUE fetch, not
    # block_until_ready(): under the dev relay's async mode
    # block_until_ready returns before the work runs (measured: a
    # 2.8 ms matmul scan "completing" in 5 us), while a scalar fetch
    # always forces the full roundtrip in both relay modes.
    float(loop(args))  # warmup/compile
    t0 = time.perf_counter()
    s = np.float32(0.0)
    for _ in range(iters):
        s += float(loop(args))
    dt = (time.perf_counter() - t0) / (iters * k)
    assert np.isfinite(s)
    return dt


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
        dt = _time_scan(lambda *s: fn(list(s)), tuple(segments))
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
                abl[mode + "_ms"] = round(_time_scan(
                    lambda *s: fn_a(list(s)), tuple(segments)) * 1e3, 3)
        rows.append({
            "level": name,
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

    dt_full = _time_scan(full, (x,))
    fps = args.batch_size / dt_full
    total_gf = sum(r["gflop"] for r in rows)

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
