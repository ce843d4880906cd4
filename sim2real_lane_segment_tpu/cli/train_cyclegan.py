"""Train a CycleGAN for sim->real domain transfer, in-framework.

The reference's CycleGAN regime depended on a generator trained in an
external repository (utils/sim2real_convert.py:85-129 only loads and
applies a torch checkpoint).  This CLI trains the full unpaired cycle
(train/cyclegan.py) on two PNG directories and saves the A->B generator
in exactly the msgpack tree ``cli/sim2real_convert.py`` consumes:

    python -m sim2real_lane_segment_tpu.cli.train_cyclegan \
        --source_dir simData/train/input --target_dir realData/unlabelled \
        --out results/cyclegan --epochs 60
    python -m sim2real_lane_segment_tpu.cli.sim2real_convert \
        --dataPath simData --modelWeightsPath results/cyclegan/g_ab.msgpack
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os

import numpy as np

from . import common

log = logging.getLogger(__name__)


def load_image_stack(path: str, height: int, width: int,
                     limit: int = 0) -> np.ndarray:
    """PNGs under ``path`` (or its input/ subtree) -> [-1,1] float32 NHWC
    (BGR channel order end-to-end, matching sim2real_convert)."""
    import cv2

    paths = sorted(glob.glob(os.path.join(path, "*.png")))
    if not paths:
        paths = sorted(glob.glob(os.path.join(path, "**", "input", "*.png"),
                                 recursive=True))
    if limit:
        paths = paths[:limit]
    if not paths:
        raise SystemExit(f"no PNGs under {path}")
    imgs = np.stack([
        cv2.resize(cv2.imread(p, cv2.IMREAD_COLOR), (width, height),
                   interpolation=cv2.INTER_CUBIC) for p in paths])
    return (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source_dir", required=True, help="domain A PNGs")
    p.add_argument("--target_dir", required=True, help="domain B PNGs")
    p.add_argument("--out", default="results/cyclegan")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("-b", "--batch_size", type=int, default=4)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--height", type=int, default=120)
    p.add_argument("-lr", "--learningRate", type=float, default=2e-4)
    p.add_argument("--num_residual_blocks", type=int, default=9)
    p.add_argument("--lambda_cyc", type=float, default=10.0)
    p.add_argument("--lambda_id", type=float, default=5.0)
    p.add_argument("--max_images", type=int, default=0,
                   help="cap images per domain (0 = all)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(args)
    common.setup_runtime()

    import jax
    from flax import serialization

    from ..train.cyclegan import CycleGANTrainer, fit_cyclegan

    images_a = load_image_stack(args.source_dir, args.height, args.width,
                                args.max_images)
    images_b = load_image_stack(args.target_dir, args.height, args.width,
                                args.max_images)
    log.info("domain A: %d images, domain B: %d images (%dx%d)",
             len(images_a), len(images_b), args.height, args.width)

    trainer = CycleGANTrainer(num_residual_blocks=args.num_residual_blocks,
                              lr=args.learningRate,
                              lambda_cyc=args.lambda_cyc,
                              lambda_id=args.lambda_id)
    state = trainer.init_state(jax.random.key(args.seed),
                               args.height, args.width)
    state, history = fit_cyclegan(trainer, state, images_a, images_b,
                                  epochs=args.epochs,
                                  batch_size=args.batch_size,
                                  seed=args.seed, log_every=5, log=log)

    os.makedirs(args.out, exist_ok=True)
    for name, params in (("g_ab", state.g_ab), ("g_ba", state.g_ba)):
        with open(os.path.join(args.out, f"{name}.msgpack"), "wb") as f:
            f.write(serialization.to_bytes({"params": jax.device_get(
                params)}))
    with open(os.path.join(args.out, "history.jsonl"), "w") as f:
        for row in history:
            f.write(json.dumps(row) + "\n")
    log.info("saved generators to %s", args.out)
    return {"out": args.out, "final": history[-1]}


if __name__ == "__main__":
    main()
