"""Side-by-side comparison CLI — the reference ``comparison.py``.

Same interface (reference comparison.py:64-78): samples ``--showCount``
images from ``--dataPath`` and renders an Input/Baseline/S&T/HM/CycleGAN/
MME montage with column headers to ``--resultPath``.

The reference built 2-class FCDenseNet57 models here (comparison.py:18) —
unlike train/test's 4-class 67 — a quirk SURVEY.md flags; this CLI keeps
the same default but makes it explicit via ``--num_cls``/``--arch``.
"""
from __future__ import annotations

import argparse
import glob
import os
import random

import cv2
import numpy as np

from . import common

COLS = ["Input", "Baseline", "S&T", "HM", "CycleGAN", "MME"]


def main(args=None) -> str:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--showCount", type=int, default=4)
    p.add_argument("--dataPath", type=str, required=True)
    p.add_argument("--baselinePath", type=str, required=True)
    p.add_argument("--sandtPath", type=str, required=True)
    p.add_argument("--hmPath", type=str, required=True)
    p.add_argument("--cycleganPath", type=str, required=True)
    p.add_argument("--mmePath", type=str, required=True)
    p.add_argument("--resultPath", type=str, default="results/comparison.png")
    p.add_argument("--num_cls", type=int, default=2,
                   help="Reference used 2-class FCDenseNet57 here (comparison.py:18)")
    p.add_argument("--arch", choices=["57", "67"], default="57")
    args = p.parse_args(args)
    common.setup_runtime()

    import jax

    from ..core.dtypes import DEFAULT_POLICY
    from ..models.tiramisu import fcdensenet57, fcdensenet67
    from ..train import checkpoint as ckpt
    from ..train.supervised import SupervisedTrainer

    factory = fcdensenet57 if args.arch == "57" else fcdensenet67
    weight_paths = [args.baselinePath, args.sandtPath, args.hmPath,
                    args.cycleganPath, args.mmePath]
    trainers, states = [], []
    for wp in weight_paths:
        tr = SupervisedTrainer(num_cls=args.num_cls, augment=False,
                               model=factory(args.num_cls, policy=DEFAULT_POLICY))
        st = tr.init_state(jax.random.key(0))
        st = ckpt.load_weights(wp, st)
        trainers.append(tr)
        states.append(st)

    img_paths = random.sample(glob.glob(os.path.join(args.dataPath, "*.png")),
                              args.showCount)

    w, h = 160, 120
    header = np.zeros((24, 6 * w, 4), np.uint8)
    for i, name in enumerate(COLS):
        header = cv2.putText(header, name, (i * w + 20, 21),
                             cv2.FONT_HERSHEY_SIMPLEX, 0.75, (0, 0, 0, 255))
    rows = [header]
    for img_path in img_paths:
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)
        preds = [np.asarray(tr.predict_step(st, img[None]))[0]
                 for tr, st in zip(trainers, states)]
        img_small = cv2.resize(img, (w, h), interpolation=cv2.INTER_LANCZOS4)
        tiles = [img_small]
        for pred in preds:
            tile = img_small.copy()
            tile[pred > 0] = (0, 0, 255)
            tiles.append(tile)
        row = cv2.cvtColor(np.concatenate(tiles, axis=1), cv2.COLOR_BGR2BGRA)
        rows.append(row)

    final = np.concatenate(rows, axis=0)
    os.makedirs(os.path.dirname(args.resultPath) or ".", exist_ok=True)
    cv2.imwrite(args.resultPath, final)
    print(f"{args.resultPath} created.")
    return args.resultPath


if __name__ == "__main__":
    main()
