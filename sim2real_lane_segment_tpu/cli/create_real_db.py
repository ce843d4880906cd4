"""Real-database builder CLI — the reference ``utils/createRealDB.py``.

Same interface (reference createRealDB.py:22-106): converts labelme-format
JSON polygon annotations into uint8 class masks with the fixed class map
{_background_:0, right:1, left:2, obstacle:3} (createRealDB.py:12-17),
splits labelled/unlabelled into the real-DB directory contract, and
supports the ``--imitate`` dry-run flag (full pipeline, no writes).

Native difference: polygon rasterization uses cv2.fillPoly directly (same
algorithm labelme's shapes_to_label uses via PIL) instead of depending on
the labelme package.
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import shutil

import cv2
import numpy as np

from . import common

log = logging.getLogger(__name__)

LABEL_NAME_TO_VALUE = {"_background_": 0, "right": 1, "left": 2, "obstacle": 3}


def shapes_to_label(img_shape, shapes, label_name_to_value) -> np.ndarray:
    """Rasterize labelme polygon shapes into a class mask (draw order =
    file order, later shapes overwrite earlier)."""
    mask = np.zeros(img_shape[:2], np.uint8)
    for shape in shapes:
        name = shape.get("label")
        if name not in label_name_to_value:
            continue
        pts = np.asarray(shape["points"], np.float64)
        pts = np.rint(pts).astype(np.int32)
        shape_type = shape.get("shape_type", "polygon")
        value = label_name_to_value[name]
        if shape_type == "polygon" and len(pts) >= 3:
            cv2.fillPoly(mask, [pts], int(value))
        elif shape_type == "rectangle" and len(pts) == 2:
            cv2.rectangle(mask, tuple(pts[0]), tuple(pts[1]), int(value), -1)
        elif shape_type == "circle" and len(pts) == 2:
            r = int(round(np.linalg.norm(pts[1] - pts[0])))
            cv2.circle(mask, tuple(pts[0]), r, int(value), -1)
        else:
            log.warning("unsupported shape_type %r — skipped", shape_type)
    return mask


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--imgPath", type=str, required=True,
                   help="Directory of raw frames (*.png) + labelme JSONs")
    p.add_argument("--TargetPath", "--targetPath", dest="targetPath", type=str,
                   default="./realData", help="Output database root")
    p.add_argument("-i", "--imitate", action="store_true",
                   help="Dry run: execute the full pipeline without writes")
    args = p.parse_args(args)

    img_paths = sorted(glob.glob(os.path.join(args.imgPath, "*.png")))
    json_by_stem = {
        os.path.splitext(os.path.basename(jp))[0]: jp
        for jp in glob.glob(os.path.join(args.imgPath, "*.json"))}

    input_dir = os.path.join(args.targetPath, "input")
    label_dir = os.path.join(args.targetPath, "label")
    unlabelled_dir = os.path.join(args.targetPath, "unlabelled")
    if not args.imitate:
        for d in (input_dir, label_dir, unlabelled_dir):
            os.makedirs(d, exist_ok=True)

    n_labelled = n_unlabelled = 0
    for img_path in img_paths:
        stem = os.path.splitext(os.path.basename(img_path))[0]
        jp = json_by_stem.get(stem)
        if jp is None:
            n_unlabelled += 1
            if not args.imitate:
                shutil.copy(img_path, os.path.join(unlabelled_dir,
                                                   f"{n_unlabelled - 1:06d}.png"))
            continue
        with open(jp) as f:
            data = json.load(f)
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)
        mask = shapes_to_label(img.shape, data.get("shapes", []),
                               LABEL_NAME_TO_VALUE)
        fname = f"{n_labelled:06d}.png"
        n_labelled += 1
        if not args.imitate:
            cv2.imwrite(os.path.join(input_dir, fname), img)
            cv2.imwrite(os.path.join(label_dir, fname), mask)

    log.info("labelled: %d, unlabelled: %d (imitate=%s)",
             n_labelled, n_unlabelled, args.imitate)
    return {"labelled": n_labelled, "unlabelled": n_unlabelled}


if __name__ == "__main__":
    main()
