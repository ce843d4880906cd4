"""Benchmark: sustained 160x120 segmentation inference frames/sec on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the driver-set north-star of 10_000 frames/sec at matched
real-domain IoU (BASELINE.json; the torch reference ran batch-1 per-frame
inference, makeDemoVideo.py:15-47).

Measures the framework's SERVING model, LaneNetLite — the distilled
student that matches/beats the FCDenseNet67 teacher's IoU (teacher 86.5
vs student 88.2 test IoU on generated sim data, RESULTS.md) at ~30x its
speed.  Set BENCH_MODEL=fcdensenet67 to measure the teacher instead,
served through the segment-wise forward (models/tiramisu_fast.py) that
eliminates the dense-concat HBM re-materialization (1 525 fps with the
standard forward in round 1).
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
        forward = lambda variables, x: pallas_apply(model, variables, x,
                                                    use_softmax=False)
    elif which == "fcdensenet67_segsum":
        # round-1 segment-wise XLA path, kept for comparison
        from sim2real_lane_segment_tpu.models.tiramisu import fcdensenet67
        from sim2real_lane_segment_tpu.models.tiramisu_fast import fast_apply
        model = fcdensenet67(4, policy=DEFAULT_POLICY)
        forward = lambda variables, x: fast_apply(model, variables, x,
                                                  use_softmax=False)
    elif which == "lanenet_int8":
        # int8 PTQ serving path (models/lanenet_int8.py): v5e MXU int8
        # runs ~2x bf16 on the same conv shapes
        from sim2real_lane_segment_tpu.models.lanenet_int8 import (
            int8_apply, quantize_lanenet)
        from sim2real_lane_segment_tpu.models.lanenet_lite import LaneNetLite
        model = LaneNetLite(n_classes=4, policy=DEFAULT_POLICY)
        forward = None
    else:
        from sim2real_lane_segment_tpu.models.lanenet_lite import LaneNetLite
        model = LaneNetLite(n_classes=4, policy=DEFAULT_POLICY)
        forward = lambda variables, x: model.apply(variables, x, train=False,
                                                   use_softmax=False)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 120, 160, 3), jnp.float32))
    if which == "lanenet_int8":
        calib = np.random.default_rng(1).integers(
            0, 255, (8, 120, 160, 3), dtype=np.uint8)
        calib_x, _ = eval_batch(jnp.asarray(calib), None, cfg,
                                with_labels=False)
        qn = quantize_lanenet(model, variables, calib_x)
        forward = lambda _vars, x: int8_apply(qn, x)

    @jax.jit
    def infer(images_u8):
        x, _ = eval_batch(images_u8, None, cfg, with_labels=False)
        return jnp.argmax(forward(variables, x), axis=-1).astype(jnp.uint8)

    batch = 256
    frames_host = np.random.default_rng(0).integers(
        0, 255, (batch, 120, 160, 3), dtype=np.uint8)
    # Device-resident input: the production pipeline (sim render -> label
    # extraction -> training/inference) is on-device end-to-end, and this
    # dev chip is fed through a slow relay whose H2D bandwidth would
    # otherwise dominate the measurement.  Two alternating buffers so no
    # output-aliasing tricks can elide work.
    frames_a = jax.device_put(frames_host)
    frames_b = jax.device_put(frames_host[::-1].copy())

    # warmup/compile
    infer(frames_a).block_until_ready()

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = infer(frames_a if i % 2 == 0 else frames_b)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    fps = batch * n_iters / dt
    print(json.dumps({
        "metric": "seg_inference_fps_160x120",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
