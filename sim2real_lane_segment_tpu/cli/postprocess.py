"""Label-extraction CLI — the reference ``postprocess_v2.py`` on TPU.

Same interface (reference postprocess_v2.py:11-15): pairs
``*_orig.avi``/``*_annot.avi`` under ``--input_dir``, writes FFV1
``input/``+``label/`` video pairs under ``--output_dir``; ``-dp`` deletes
processed recordings, ``-cd`` clears the output dir first.

TPU-native difference: frames are processed in device batches through the
jitted ``process_classes`` graph (ops/labelgen.py) instead of a per-frame
cv2 loop, with decode and encode on host threads.
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
from random import shuffle

import cv2
import numpy as np

from . import common

log = logging.getLogger(__name__)


def process_recording(orig_fp: str, annot_fp: str, input_file: str,
                      label_file: str, batch_size: int = 32) -> bool:
    import numpy as np

    from ..data import videoio
    from ..ops.labelgen import process_classes_batch

    n_orig = videoio.frame_count(orig_fp)
    n_annot = videoio.frame_count(annot_fp)
    if n_orig != n_annot:
        log.warning("Different video length encountered! Continuing...")
        return False

    try:
        pair_iter = videoio.read_paired_frames(orig_fp, annot_fp, batch_size)
    except IOError:
        log.warning("Could not open files! Continuing...")
        return False

    w_in = w_lab = None
    try:
        for orig, annot in pair_iter:
            if w_in is None:
                h, w = orig.shape[1:3]
                w_in = videoio.AsyncVideoWriter(input_file, frame_size=(w, h))
                w_lab = videoio.AsyncVideoWriter(label_file, frame_size=(w, h))
            masks = np.asarray(process_classes_batch(orig, annot))
            w_in.write(orig)
            # reference writes the gray mask expanded to BGR
            w_lab.write(np.repeat(masks[..., None], 3, axis=-1))
    finally:
        if w_in is not None:
            w_in.close()
            w_lab.close()
    return w_in is not None


def main(args=None) -> int:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-dp", "--delete_processed", action="store_true")
    p.add_argument("-cd", "--clear_data", action="store_true")
    p.add_argument("-id", "--input_dir", default=os.path.join(os.getcwd(), "recordings"))
    p.add_argument("-od", "--output_dir", default=os.path.join(os.getcwd(), "data"))
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args(args)
    common.setup_runtime()

    if args.clear_data:
        import shutil
        shutil.rmtree(args.output_dir, ignore_errors=True)

    annot_list = sorted(glob.glob(os.path.join(args.input_dir, "*_annot.avi")))
    orig_list = sorted(glob.glob(os.path.join(args.input_dir, "*_orig.avi")))
    assert len(annot_list) == len(orig_list), \
        "Length mismatch! No postprocess performed."

    raw_list = list(zip(orig_list, annot_list))
    shuffle(raw_list)

    input_dir = os.path.join(args.output_dir, "input")
    label_dir = os.path.join(args.output_dir, "label")
    os.makedirs(input_dir, exist_ok=True)
    os.makedirs(label_dir, exist_ok=True)

    vid_counter = 0
    done = 0
    for orig_fp, annot_fp in raw_list:
        while True:
            filename = f"{vid_counter:06d}.avi"
            input_file = os.path.join(input_dir, filename)
            label_file = os.path.join(label_dir, filename)
            if not (os.path.exists(input_file) or os.path.exists(label_file)):
                break
            vid_counter += 1
        log.info("Processing recording nr. %d...", vid_counter)
        if process_recording(orig_fp, annot_fp, input_file, label_file,
                             args.batch_size):
            done += 1
            log.info("Processing of recording nr. %d done.", vid_counter)

    if args.delete_processed:
        import shutil
        shutil.rmtree(args.input_dir, ignore_errors=True)

    log.info("Post-processing finished! (%d/%d recordings)", done, len(raw_list))
    return done


if __name__ == "__main__":
    main()
