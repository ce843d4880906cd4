"""Database-builder CLI — the reference ``utils/preprocessDatabase.py``.

Same interface (reference preprocessDatabase.py:229-251): ``--dbType
sim|real``, ``--single_sim_dir``, ``--dataPath``, ``--train_ratio``,
``--grayscale``, ``--resize``, ``--width``, ``--height``; seeds
``random.seed(42)``.

Behavior preserved: explode paired AVIs under ``input/``+``label/`` into
numbered PNGs (labels grayscale-converted), then shuffle-split sim data
70/15/15 into train/valid/test (or 'real' data into train/test +
re-nested ``unlabelled/input``), moving files into the reference's exact
directory contract.
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import shutil
from random import seed, shuffle

import cv2

from . import common

log = logging.getLogger(__name__)


class GrayscaleResizeTransform:
    """Optional grayscale + resize (nearest for labels) at explode time
    (reference preprocessDatabase.py:206-226)."""

    def __init__(self, grayscale: bool, new_res: tuple | None = None):
        self.grayscale = grayscale
        self.new_res = new_res

    def __call__(self, img, label):
        if img is not None:
            if self.grayscale:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            if self.new_res is not None:
                img = cv2.resize(img, self.new_res)
        if label is not None and self.new_res is not None:
            label = cv2.resize(label, self.new_res, interpolation=cv2.INTER_NEAREST)
        return img, label


def videos2images(directory: str, transform=None, have_labels: bool = True,
                  delete_processed: bool = False) -> int:
    """Explode paired videos into numbered PNG frames."""
    input_dir = os.path.join(directory, "input")
    label_dir = os.path.join(directory, "label") if have_labels else None
    if not os.path.isdir(input_dir) or (have_labels and not os.path.isdir(label_dir)):
        raise FileNotFoundError("Unexpected directory structure!")

    input_vids = sorted(glob.glob(os.path.join(input_dir, "*.avi")))
    label_vids = sorted(glob.glob(os.path.join(label_dir, "*.avi"))) if have_labels else None
    if have_labels and len(input_vids) != len(label_vids):
        raise RuntimeError("Different number of input and target videos!")
    if not input_vids:
        log.info("%s: No data found.", directory)
        return 0

    img_counter = 0
    for k, input_vid in enumerate(input_vids):
        label_vid = label_vids[k] if have_labels else None
        in_cap = cv2.VideoCapture(input_vid)
        lab_cap = cv2.VideoCapture(label_vid) if have_labels else None
        if not in_cap.isOpened() or (have_labels and not lab_cap.isOpened()):
            log.warning("Could not open file! Continuing...")
            continue
        if have_labels and in_cap.get(cv2.CAP_PROP_FRAME_COUNT) != \
                lab_cap.get(cv2.CAP_PROP_FRAME_COUNT):
            log.warning("Different video length encountered at: %s! Continuing...",
                        input_vid)
            continue
        while True:
            ret_i, input_frame = in_cap.read()
            ret_l, label_frame = lab_cap.read() if have_labels else (None, None)
            if not ret_i or (have_labels and not ret_l):
                break
            if have_labels:
                label_frame = cv2.cvtColor(label_frame, cv2.COLOR_BGR2GRAY)
            if transform is not None:
                input_frame, label_frame = transform(input_frame, label_frame)
            filename = f"{img_counter:06d}.png"
            cv2.imwrite(os.path.join(input_dir, filename), input_frame)
            if have_labels:
                cv2.imwrite(os.path.join(label_dir, filename), label_frame)
            img_counter += 1
        in_cap.release()
        if lab_cap:
            lab_cap.release()
        if delete_processed:
            os.remove(input_vid)
            if label_vid:
                os.remove(label_vid)

    log.info("%s: images generated: %d", directory, img_counter)
    return img_counter


def _split_move(data_path: str, set_specs: list[tuple[str, list]]) -> None:
    for set_name, img_set in set_specs:
        set_path = os.path.join(data_path, set_name)
        os.makedirs(os.path.join(set_path, "input"))
        os.makedirs(os.path.join(set_path, "label"))
        for i, (input_img, label_img) in enumerate(img_set):
            filename = f"{i:06d}.png"
            shutil.move(input_img, os.path.join(set_path, "input", filename))
            shutil.move(label_img, os.path.join(set_path, "label", filename))


def _paired_pngs(data_path: str):
    input_imgs = sorted(glob.glob(os.path.join(data_path, "input", "*.png")))
    label_imgs = sorted(glob.glob(os.path.join(data_path, "label", "*.png")))
    assert len(input_imgs) == len(label_imgs), \
        "Input and label image count is not the same!"
    imgs = list(zip(input_imgs, label_imgs))
    shuffle(imgs)
    return imgs


def create_right_lane_database(data_path: str, transform=None,
                               use_single_set: bool = False) -> None:
    """Sim DB: explode videos then 70/15/15 train/valid/test split."""
    if not os.path.exists(data_path):
        raise FileNotFoundError(f"Directory {data_path} does not exist!")
    videos2images(data_path, transform, True, True)
    if use_single_set:
        return
    imgs = _paired_pngs(data_path)
    train_end = int(round(len(imgs) * 0.7))
    test_start = int(round(len(imgs) * 0.85))
    assert train_end < test_start, "probably too few data is available!"
    _split_move(data_path, [("train", imgs[:train_end]),
                            ("valid", imgs[train_end:test_start]),
                            ("test", imgs[test_start:])])
    shutil.rmtree(os.path.join(data_path, "input"))
    shutil.rmtree(os.path.join(data_path, "label"))


def preprocess_real_db(data_path: str, transform=None,
                       train_ratio: float = 0.7) -> None:
    """Real DB: train/test split + unlabelled re-nest (unlabelled/input)."""
    if not os.path.exists(data_path):
        raise FileNotFoundError(f"Directory {data_path} does not exist!")
    unlabelled_dir = os.path.join(data_path, "unlabelled")
    for d in ("input", "label", "unlabelled"):
        if not os.path.exists(os.path.join(data_path, d)):
            raise FileNotFoundError(f"Directory {d} does not exist!")
    imgs = _paired_pngs(data_path)
    train_end = int(round(len(imgs) * train_ratio))
    _split_move(data_path, [("train", imgs[:train_end]),
                            ("test", imgs[train_end:])])
    tmp = os.path.join(data_path, ".temp")
    shutil.move(unlabelled_dir, tmp)
    shutil.move(tmp, os.path.join(unlabelled_dir, "input"))
    shutil.rmtree(os.path.join(data_path, "input"))
    shutil.rmtree(os.path.join(data_path, "label"))


def main(args=None) -> None:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dbType", choices=["sim", "real"], required=True)
    p.add_argument("--single_sim_dir", action="store_true")
    p.add_argument("--dataPath", type=str, default="./realData")
    p.add_argument("--train_ratio", type=float, default=0.7)
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--resize", action="store_true")
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--height", type=int, default=120)
    args = p.parse_args(args)
    seed(42)

    new_res = (args.width, args.height) if args.resize else None
    transform = GrayscaleResizeTransform(args.grayscale, new_res)
    assert 0 < args.train_ratio <= 1

    if args.dbType == "real":
        preprocess_real_db(args.dataPath, transform, args.train_ratio)
    else:
        create_right_lane_database(args.dataPath, transform, args.single_sim_dir)


if __name__ == "__main__":
    main()
