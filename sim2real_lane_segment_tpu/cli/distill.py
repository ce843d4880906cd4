"""Distillation CLI: train the fast LaneNetLite student from a trained
FCDenseNet teacher checkpoint (the serving-speed path to the 10k fps
target — see models/lanenet_lite.py)."""
from __future__ import annotations

import argparse
import logging
import os

from . import common

log = logging.getLogger(__name__)


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataPath", type=str, required=True)
    p.add_argument("--teacherPath", type=str, required=True,
                   help="best_weights.msgpack of a trained teacher")
    p.add_argument("--teacher_arch", choices=["67", "67r", "57", "103", "tiny", "lite", "encdec"],
                   default="67")
    p.add_argument("--model_name", type=str, default="lanenet_lite")
    p.add_argument("--max_epochs", type=int, default=75)
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--default_root_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    common.add_data_args(p)
    common.add_model_args(p)
    args = p.parse_args(args)
    common.setup_runtime()

    import jax

    from ..data.modules import SimulatorDataModule
    from ..train import checkpoint as ckpt
    from ..train.distill import DistillTrainer
    from ..train.loop import fit
    from ..train.supervised import SupervisedTrainer
    from .test import build_model

    # teacher
    t_trainer = SupervisedTrainer(
        num_cls=4, augment=False, height=args.height, width=args.width,
        model=build_model(args.teacher_arch, 4))
    t_state = t_trainer.init_state(jax.random.key(0))
    t_state = ckpt.load_weights(args.teacherPath, t_state)

    trainer = DistillTrainer(
        teacher_model=t_trainer.model, teacher_params=t_state.params,
        teacher_batch_stats=t_state.batch_stats, num_cls=4,
        lr=args.learningRate, decay=args.decay, lr_ratio=args.lrRatio,
        temperature=args.temperature, alpha=args.alpha,
        height=args.height, width=args.width, augment=args.augment)

    data = SimulatorDataModule(data_path=args.dataPath,
                               batch_size=args.batch_size, seed=args.seed,
                               load_into_memory=args.load2memory)
    data.setup()
    state = trainer.init_state(jax.random.key(args.seed))

    out_dir = os.path.join(args.default_root_dir or "results", args.model_name)
    best_state, best_iou, _ = fit(trainer, state, data,
                                  max_epochs=args.max_epochs,
                                  out_dir=out_dir, seed=args.seed)
    log.info("student best val_iou %.4f; artifacts in %s", best_iou, out_dir)
    return {"best_iou": best_iou, "out_dir": out_dir}


if __name__ == "__main__":
    main()
