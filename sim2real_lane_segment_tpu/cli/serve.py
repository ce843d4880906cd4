"""Streaming inference server CLI.

Serves a trained segmentation model behind a batch-aggregating ZMQ
front-end (serving.py): many concurrent clients, fixed-shape device
batches, one compile per power-of-two bucket.  This is the production
replacement for the reference's per-frame loops (makeDemoVideo.py:15-47
ran batch-1 ``unsqueeze(0)`` inference) over the same numpy-over-zmq
wire protocol as its robot/sim bridges (duckiebot_env.py:31-38).

    python -m sim2real_lane_segment_tpu.cli.serve \
        --checkpointPath results/checkpoints --arch lite --port 8903

``--int8`` serves the PTQ-quantized LaneNetLite (models/lanenet_int8.py);
``--int8 --fused`` serves it through the fused Pallas body kernel
(models/lanenet_pallas.py)
calibrated on ``--calib_dir`` PNGs (or synthetic frames without it).
"""
from __future__ import annotations

import argparse
import glob
import logging

import numpy as np

from . import common

log = logging.getLogger(__name__)


def build_predict_fn(args):
    """Returns (predict_fn, height, width): uint8 NHW3 -> uint8 NHW."""
    import jax
    import jax.numpy as jnp

    from ..ops.augment import eval_batch
    from .test import load_trainer_and_state

    trainer, state = load_trainer_and_state(
        args.module_type, args.checkpointPath, num_cls=args.num_cls,
        arch=args.arch, height=args.height, width=args.width)

    if not args.int8:
        predict = (trainer.predict_step_fused if getattr(args, "fused", False)
                   else trainer.predict_step)
        return (lambda frames: predict(state, frames),
                args.height, args.width)

    if args.arch != "lite":
        raise SystemExit("--int8 requires --arch lite (models/lanenet_int8)")
    from ..models.lanenet_int8 import int8_apply, quantize_lanenet

    if args.calib_dir:
        import cv2

        paths = sorted(glob.glob(f"{args.calib_dir}/*.png"))[:64]
        frames = np.stack([
            cv2.resize(cv2.imread(p), (args.width, args.height),
                       interpolation=cv2.INTER_LANCZOS4) for p in paths])
        log.info("calibrating int8 scales on %d frames from %s",
                 len(paths), args.calib_dir)
    else:
        frames = np.random.default_rng(0).integers(
            0, 255, (16, args.height, args.width, 3), dtype=np.uint8)
        log.warning("no --calib_dir: calibrating int8 on synthetic noise")
    calib_x, _ = eval_batch(jnp.asarray(frames), None, trainer.cfg,
                            with_labels=False)
    qn = quantize_lanenet(
        trainer.model,
        {"params": state.params, "batch_stats": state.batch_stats}, calib_x)

    if getattr(args, "fused", False):
        # fused int8 Pallas body kernel (models/lanenet_pallas.py)
        from ..models.lanenet_pallas import pallas_int8_serve

        @jax.jit
        def predict(frames_u8):
            return pallas_int8_serve(qn, frames_u8, cfg=trainer.cfg)
    else:
        @jax.jit
        def predict(frames_u8):
            x, _ = eval_batch(frames_u8, None, trainer.cfg,
                              with_labels=False)
            out = int8_apply(qn, x)
            return jnp.argmax(out, axis=-1).astype(jnp.uint8)

    return predict, args.height, args.width


def main(args=None) -> None:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpointPath", required=True,
                   help="checkpoint dir or .msgpack weights")
    p.add_argument("--module_type", default="baseline",
                   choices=["baseline", "sandt", "hm", "CycleGAN", "mme"])
    p.add_argument("--arch", default="lite",
                   choices=["67", "67r", "57", "103", "tiny", "lite", "encdec"])
    p.add_argument("--num_cls", type=int, default=4)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--height", type=int, default=120)
    p.add_argument("--fused", action="store_true",
                   help="serve FC-DenseNet archs through the "
                        "fused-Pallas forward (~2x on TPU)")
    p.add_argument("--int8", action="store_true",
                   help="serve the PTQ int8 path (lite arch only)")
    p.add_argument("--calib_dir", default=None,
                   help="PNG dir for int8 activation calibration")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8903)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_wait_ms", type=float, default=4.0)
    args = p.parse_args(args)
    common.setup_runtime()

    from ..serving import BatchingEngine, serve_inference

    predict_fn, h, w = build_predict_fn(args)
    engine = BatchingEngine(predict_fn, height=h, width=w,
                            max_batch=args.max_batch,
                            max_wait_ms=args.max_wait_ms)
    try:
        serve_inference(engine, host=args.host, port=args.port)
    finally:
        engine.close()


if __name__ == "__main__":
    main()
