"""Real-domain data ingestion end-to-end on COMMITTED labelme fixtures.

The reference's real pipeline (utils/createRealDB.py:22-87 +
utils/preprocessDatabase.py:161-203): labelme polygon JSONs -> class
masks -> labelled/unlabelled split -> train/test + unlabelled re-nest ->
the simRealData target-domain contract consumed by S&T/MME training.
The committed fixtures (tests/fixtures/labelme_frames/) are tiny
labelme-format files with the realistic field set (version/flags/
imagePath/imageHeight/... as labelme writes them), so the parser is
exercised on the real format, not synthetic minimal dicts — the actual
real-Duckiebot download remains egress-blocked (ROADMAP)."""
import os
import shutil

import cv2
import numpy as np
import pytest

import jax

from sim2real_lane_segment_tpu.cli import create_real_db, preprocess_db
from sim2real_lane_segment_tpu.data.modules import TwoDomainMMEDataModule
from sim2real_lane_segment_tpu.train.mme import MMETrainer

from helpers import tiny_model, write_split

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "labelme_frames")


def test_labelme_fixtures_to_mme_training(tmp_path, rng):
    # 1. labelme JSONs + frames -> realData {input,label,unlabelled}
    real = str(tmp_path / "realData")
    res = create_real_db.main(["--imgPath", FIXTURES, "--targetPath", real])
    assert res == {"labelled": 3, "unlabelled": 3}
    label = cv2.imread(os.path.join(real, "label", "000000.png"),
                       cv2.IMREAD_GRAYSCALE)
    # the fixed class map {bg:0, right:1, left:2, obstacle:3}
    # (reference createRealDB.py:12-17), polygons rasterized in file order
    assert set(np.unique(label)) == {0, 1, 2, 3}
    assert label[35, 10] == 1      # right-lane band
    assert label[24, 10] == 2      # left-lane band
    assert label[12, 50] == 3      # obstacle box
    assert label[5, 5] == 0        # background

    # 2. train/test split + unlabelled re-nest (preprocessRealDB parity)
    preprocess_db.main(["--dbType", "real", "--dataPath", real,
                        "--train_ratio", "0.67"])
    for d in ("train/input", "train/label", "test/input", "test/label",
              "unlabelled/input"):
        assert os.path.isdir(os.path.join(real, d)), d
    assert len(os.listdir(os.path.join(real, "train", "input"))) == 2
    assert len(os.listdir(os.path.join(real, "test", "input"))) == 1
    assert len(os.listdir(os.path.join(real, "unlabelled", "input"))) == 3

    # 3. the processed real tree IS the simRealData target domain;
    #    combine with a sim source and run one real MME train step
    root = str(tmp_path / "simRealData")
    write_split(os.path.join(root, "source"), 1, rng, h=48, w=64)
    shutil.copytree(real, os.path.join(root, "target"))
    dm = TwoDomainMMEDataModule(data_path=root, batch_size=2)
    dm.setup()      # also checks len(labelled) <= len(unlabelled)
    batch = next(iter(dm.train_batches(0)))
    (x, y), xu = batch
    assert x.shape == (2, 48, 64, 3) and y.shape == (2, 48, 64)
    assert xu.shape == (2, 48, 64, 3)

    tr = MMETrainer(num_cls=4, height=24, width=32, augment=False,
                    model=tiny_model())
    state = tr.init_state(jax.random.key(0))
    state, logs = tr.default_step_fn(state, batch, jax.random.key(1), 0)
    assert np.isfinite(float(logs["tr_loss"]))
    assert np.isfinite(float(logs["tr_loss_adent"]))


def test_labelme_imitate_is_write_free(tmp_path):
    out = str(tmp_path / "realData")
    res = create_real_db.main(["--imgPath", FIXTURES, "--targetPath", out,
                               "--imitate"])
    assert res == {"labelled": 3, "unlabelled": 3}
    assert not os.path.exists(out)
