"""Demo-video inference CLI — the reference ``makeDemoVideo.py``, batched.

Same interface (reference makeDemoVideo.py:73-84): ``-t/--module_type``,
``--checkpointPath``, ``--videoIns``/``--videoOuts``; writes 160x120 FFV1
videos with the class color overlay per frame.

The reference ran an ``unsqueeze(0)`` batch-1 forward per frame — the
throughput-critical loop SURVEY.md calls out.  Here frames stream in
device-sized batches through one jitted graph (decode → resize/normalize →
forward → argmax → overlay), with decode and encode on host threads.
"""
from __future__ import annotations

import argparse
import logging
import os

import cv2
import numpy as np

from . import common
from .test import OVERLAY_BGR, load_trainer_and_state

log = logging.getLogger(__name__)


def predict_video(input_video: str, output_video: str, trainer, state,
                  batch_size: int = 64, predict=None) -> int:
    from ..data import videoio

    predict = predict or trainer.predict_step
    fps = videoio.fps_of(input_video)
    n = 0
    with videoio.AsyncVideoWriter(output_video,
                                  frame_size=(trainer.cfg.width, trainer.cfg.height),
                                  fps=fps) as w:
        for frames in videoio.read_frames(input_video, batch_size):
            preds = np.asarray(predict(state, frames))
            for frame, pred in zip(frames, preds):
                out = cv2.resize(frame, (trainer.cfg.width, trainer.cfg.height),
                                 interpolation=cv2.INTER_LANCZOS4)
                for cls, color in OVERLAY_BGR.items():
                    out[pred == cls] = color
                w.write(out)
                n += 1
    return n


def main(args=None) -> int:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-t", "--module_type", required=True,
                   choices=["baseline", "sandt", "hm", "CycleGAN", "MME"])
    p.add_argument("--checkpointPath", type=str, required=True)
    p.add_argument("--videoIns", type=str, nargs="+", required=True)
    p.add_argument("--videoOuts", type=str, default=["./demoVideo.avi"], nargs="+")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--arch", choices=["67", "67r", "57", "103", "tiny", "lite", "encdec"], default="67")
    p.add_argument("--fused", action="store_true",
                   help="run inference through the fused-Pallas FC-DenseNet "
                        "forward (same outputs, ~2x on TPU)")
    args = p.parse_args(args)
    common.setup_runtime()

    assert len(args.videoIns) == len(args.videoOuts)

    module_type = "mme" if args.module_type == "MME" else args.module_type
    trainer, state = load_trainer_and_state(module_type, args.checkpointPath,
                                            arch=args.arch)

    total = 0
    for vin, vout in zip(args.videoIns, args.videoOuts):
        if os.path.exists(vout):
            os.remove(vout)
        n = predict_video(vin, vout, trainer, state, args.batch_size,
                          predict=(trainer.predict_step_fused if args.fused
                                   else trainer.predict_step))
        log.info("%s -> %s (%d frames)", vin, vout, n)
        total += n
    return total


if __name__ == "__main__":
    main()
