"""Benchmark: sustained 160x120 segmentation inference frames/sec on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the driver-set north-star of 10_000 frames/sec at matched
real-domain IoU (BASELINE.json; the torch reference ran batch-1 per-frame
inference, makeDemoVideo.py:15-47).

Measures the framework's SERVING model, LaneNetLite — the distilled
student, ~30x faster than the FCDenseNet67 teacher.  Accuracy carry is
per-regime and session-dependent at the toy study scale (RESULTS.md
round-3/round-4 distillation tables): on the source domain the student
beats the teacher (88.2 vs 86.5 test IoU); on the adapted sim2real
regimes the target-appearance KD student retains the bulk of the
teacher's target IoU (round-4 full 5-regime table: carry −6.7..+1.9;
round-3 session measured +0.4..+3.4 on the same recipe), while the
source-only baseline student gives back ~10-13 IoU (no target frames
exist to distill on there).  Set BENCH_MODEL=fcdensenet67 to measure
the teacher instead, served through the fused-Pallas forward
(models/tiramisu_pallas.py).

Measurement harness: the dev-environment TPU is driven through a relay
whose per-dispatch overhead is ~1.3 ms — comparable to the network's
own device time — so the sustained-throughput loop runs ON DEVICE as a
``lax.scan`` over independent batch slices (one dispatch, K sequential
batch passes, each consuming its own input slice so no work can be
hoisted/elided).  This is the production streaming shape: frames queue
on device, the chip never waits for the host.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 10_000.0


def main() -> None:
    from sim2real_lane_segment_tpu.core.runtime import setup_cache
    setup_cache()

    import jax
    import jax.numpy as jnp

    from sim2real_lane_segment_tpu.core.dtypes import DEFAULT_POLICY
    from sim2real_lane_segment_tpu.ops.augment import AugmentConfig, eval_batch

    cfg = AugmentConfig()
    which = os.environ.get("BENCH_MODEL", "lanenet_lite")
    if which == "fcdensenet67":
        # fused-Pallas serving path (models/tiramisu_pallas.py): VMEM-
        # resident dense blocks + kn2row tap packing + in-kernel classifier
        from sim2real_lane_segment_tpu.models.tiramisu import fcdensenet67
        from sim2real_lane_segment_tpu.models.tiramisu_pallas import (
            pallas_apply)
        model = fcdensenet67(4, policy=DEFAULT_POLICY)
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, 120, 160, 3), jnp.float32))

        def predict(images_u8):
            x, _ = eval_batch(images_u8, None, cfg, with_labels=False)
            y = pallas_apply(model, variables, x, use_softmax=False)
            return jnp.argmax(y, axis=-1).astype(jnp.uint8)
    elif which == "fcdensenet67_segsum":
        # round-1 segment-wise XLA path, kept for comparison
        from sim2real_lane_segment_tpu.models.tiramisu import fcdensenet67
        from sim2real_lane_segment_tpu.models.tiramisu_fast import fast_apply
        model = fcdensenet67(4, policy=DEFAULT_POLICY)
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, 120, 160, 3), jnp.float32))

        def predict(images_u8):
            x, _ = eval_batch(images_u8, None, cfg, with_labels=False)
            y = fast_apply(model, variables, x, use_softmax=False)
            return jnp.argmax(y, axis=-1).astype(jnp.uint8)
    elif which in ("lanenet_int8", "lanenet_int8_pallas"):
        # int8 PTQ serving paths: XLA graph (models/lanenet_int8.py) or
        # the fused Pallas body kernel (models/lanenet_pallas.py)
        from sim2real_lane_segment_tpu.models.lanenet_int8 import (
            int8_apply, quantize_lanenet)
        from sim2real_lane_segment_tpu.models.lanenet_lite import LaneNetLite
        model = LaneNetLite(n_classes=4, policy=DEFAULT_POLICY)
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, 120, 160, 3), jnp.float32))
        calib = np.random.default_rng(1).integers(
            0, 255, (8, 120, 160, 3), dtype=np.uint8)
        calib_x, _ = eval_batch(jnp.asarray(calib), None, cfg,
                                with_labels=False)
        qn = quantize_lanenet(model, variables, calib_x)

        if which == "lanenet_int8_pallas":
            from sim2real_lane_segment_tpu.models.lanenet_pallas import (
                pallas_int8_serve)
            ft = int(os.environ.get("BENCH_FT", "1"))

            def predict(images_u8):
                return pallas_int8_serve(qn, images_u8, ft=ft)
        else:
            def predict(images_u8):
                x, _ = eval_batch(images_u8, None, cfg, with_labels=False)
                return jnp.argmax(int8_apply(qn, x),
                                  axis=-1).astype(jnp.uint8)
    else:
        from sim2real_lane_segment_tpu.models.lanenet_lite import (
            LaneNetLite, serve_apply)
        model = LaneNetLite(n_classes=4, policy=DEFAULT_POLICY)
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, 120, 160, 3), jnp.float32))
        # Measure the shipped artifact when present (same graph/fps as a
        # random init — this pins the measured model to the committed
        # reference-scale student so the fps and the accuracy claim above
        # describe one artifact).  BENCH_WEIGHTS overrides.
        wpath = os.environ.get(
            "BENCH_WEIGHTS",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", "refscale_67",
                         "student_mme_weights.msgpack"))
        if os.path.exists(wpath):
            from flax import serialization
            with open(wpath, "rb") as f:
                variables = serialization.from_bytes(
                    jax.device_get(variables), f.read())
            variables = jax.tree_util.tree_map(jnp.asarray, variables)

        def predict(images_u8):
            return serve_apply(model, variables, images_u8)

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    k_slices = int(os.environ.get("BENCH_SLICES", "8"))

    @jax.jit
    def infer_stream(stacked_u8):
        # one dispatch, K sequential batch passes; every pass reads its
        # own slice so nothing is loop-invariant
        return jax.lax.scan(lambda c, imgs: (c, predict(imgs)),
                            0, stacked_u8)[1]

    # Device-resident input: the production pipeline (sim render -> label
    # extraction -> training/inference) is on-device end-to-end, and this
    # dev chip is fed through a slow relay whose H2D bandwidth would
    # otherwise dominate the measurement.  Two alternating stacks so no
    # output-aliasing tricks can elide work.
    host = np.random.default_rng(0).integers(
        0, 255, (k_slices, batch, 120, 160, 3), dtype=np.uint8)
    stack_a = jax.device_put(host)
    stack_b = jax.device_put(host[::-1].copy())

    infer_stream(stack_a).block_until_ready()  # warmup/compile

    n_iters = 8
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = infer_stream(stack_a if i % 2 == 0 else stack_b)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    fps = k_slices * batch * n_iters / dt
    print(json.dumps({
        "metric": "seg_inference_fps_160x120",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
