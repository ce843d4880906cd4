"""Evaluation CLI — the reference ``test.py`` rebuilt TPU-native.

Same interface (reference test.py:118-129): ``-t/--module_type``,
``--checkpointPath``, ``-c/--showCount``, ``--realDataPath``,
``--trainDataPath``, ``--testDataPath``.  Produces the same artifacts:
a sample-prediction montage (``results/samplePredictions.png`` with the
class color overlay: 1=green right lane, 2=red left, 3=blue obstacle in
BGR) and the full test-set metric pass incl. the 4x4 confusion matrix —
here as batched jitted inference.
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import random

import cv2
import numpy as np

from . import common

log = logging.getLogger(__name__)

OVERLAY_BGR = {1: (0, 255, 0), 2: (255, 0, 0), 3: (0, 0, 255)}


def overlay_prediction(img_bgr: np.ndarray, pred: np.ndarray) -> np.ndarray:
    out = img_bgr.copy()
    for cls, color in OVERLAY_BGR.items():
        out[pred == cls] = color
    return out


ARCHES = ["67", "67r", "57", "103", "tiny", "lite", "encdec"]


def build_model(arch: str, num_cls: int):
    from ..models.encdec import EncDecNet
    from ..models.lanenet_lite import LaneNetLite
    from ..models.tiramisu import FCDenseNet, fcdensenet57, fcdensenet103
    from ..models.tiramisu import fcdensenet67
    if arch == "67":
        return None  # trainer default
    return {"67r": lambda: fcdensenet67(num_cls, remat=True),
            "57": lambda: fcdensenet57(num_cls),
            "103": lambda: fcdensenet103(num_cls),
            "lite": lambda: LaneNetLite(n_classes=num_cls),
            "encdec": lambda: EncDecNet(n_features=64, n_levels=3,
                                        kernel_size=3, n_classes=num_cls),
            "tiny": lambda: FCDenseNet(
                n_classes=num_cls, down_blocks=(2, 2), up_blocks=(2, 2),
                bottleneck_layers=2, growth_rate=4,
                out_chans_first_conv=8)}[arch]()


def load_trainer_and_state(module_type: str, checkpoint_path: str,
                           num_cls: int = 4, arch: str = "67",
                           height: int = 120, width: int = 160):
    import jax

    from ..train import checkpoint as ckpt
    from ..train.mme import MMETrainer
    from ..train.supervised import SupervisedTrainer

    kw = dict(num_cls=num_cls, augment=False, model=build_model(arch, num_cls),
              height=height, width=width)
    if module_type == "mme":
        trainer = MMETrainer(**kw)
    elif module_type in ("baseline", "sandt", "hm", "CycleGAN"):
        trainer = SupervisedTrainer(**kw)
    else:
        raise RuntimeError(f"Cannot recognize module type {module_type}")
    state = trainer.init_state(jax.random.key(0))
    if os.path.isdir(checkpoint_path) or checkpoint_path.endswith(".msgpack"):
        if os.path.isdir(checkpoint_path):
            state, _ = ckpt.load_checkpoint(checkpoint_path, state)
        else:
            state = ckpt.load_weights(checkpoint_path, state)
    else:
        raise RuntimeError(f"Unknown checkpoint format: {checkpoint_path}")
    return trainer, state


def sample_montage(trainer, state, train_paths, real_paths, out_path,
                   predict=None):
    predict = predict or trainer.predict_step
    rows = []
    for tp, rp in zip(train_paths, real_paths):
        imgs = []
        for path in (tp, rp):
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            img = cv2.resize(img, (trainer.cfg.width, trainer.cfg.height),
                             interpolation=cv2.INTER_LANCZOS4)
            imgs.append(img)
        preds = np.asarray(predict(state, np.stack(imgs)))
        row = np.concatenate([imgs[0], overlay_prediction(imgs[0], preds[0]),
                              imgs[1], overlay_prediction(imgs[1], preds[1])], axis=1)
        rows.append(row)
    montage = np.concatenate(rows, axis=0)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    cv2.imwrite(out_path, montage)
    return out_path


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-t", "--module_type", required=True,
                   choices=["baseline", "sandt", "hm", "CycleGAN", "mme"])
    p.add_argument("--checkpointPath", type=str, required=True)
    p.add_argument("-c", "--showCount", type=int, default=5)
    p.add_argument("--realDataPath", type=str)
    p.add_argument("--trainDataPath", type=str)
    p.add_argument("--testDataPath", type=str)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--arch", choices=ARCHES, default="67")
    p.add_argument("--fused", action="store_true",
                   help="serve predictions through the fused-Pallas "
                        "FC-DenseNet forward (same outputs, ~2x on TPU)")
    p.add_argument("--height", type=int, default=120)
    p.add_argument("--width", type=int, default=160)
    args = p.parse_args(args)
    common.setup_runtime()

    random.seed(42)

    import jax

    from ..data.datasets import RightLaneDataset
    from ..data.samplers import batched
    from ..ops.augment import eval_batch
    from ..ops.metrics import confusion_matrix, summarize_weighted

    trainer, state = load_trainer_and_state(
        args.module_type, args.checkpointPath, arch=args.arch,
        height=args.height, width=args.width)
    predict = (trainer.predict_step_fused if args.fused
               else trainer.predict_step)
    results: dict = {}

    if args.trainDataPath and args.realDataPath:
        train_paths = random.sample(
            glob.glob(os.path.join(args.trainDataPath, "*.png")), args.showCount)
        real_paths = random.sample(
            glob.glob(os.path.join(args.realDataPath, "*.png")), args.showCount)
        out = sample_montage(trainer, state, train_paths, real_paths,
                             "results/samplePredictions.png", predict=predict)
        log.info("wrote %s", out)
        results["montage"] = out

    if args.testDataPath:
        ds = RightLaneDataset(args.testDataPath, True)
        outs = []
        conf = np.zeros((4, 4), np.int64)
        for idx in batched(np.arange(len(ds)), args.batch_size, drop_last=False):
            images, labels = ds.read_batch(idx)
            outs.append(jax.device_get(trainer.eval_step(state, images, labels)))
            preds = np.asarray(predict(state, images))
            _, y = eval_batch(images, labels, trainer.cfg)
            conf += np.asarray(confusion_matrix(preds, np.asarray(y), 4))
        logs = summarize_weighted(outs)
        print(f"Accuracy on test set: {logs['acc']:.4f}%")
        print(f"Dice score on test set: {logs['dice']:.4f}")
        print(f"IoU on test set: {logs['iou']:.4f}")
        print("Confusion matrix (column: prediction, row: label):")
        print(conf)
        print(f"Total: {conf.sum()}")
        results.update(logs)
        results["confusion"] = conf

    return results


if __name__ == "__main__":
    main()
