"""CLI pipeline integration: datagen recordings -> postprocess ->
preprocess_db -> train (tiny) -> test/demo — the full reference user
journey on synthetic data."""
import glob
import json
import os

import cv2
import numpy as np
import pytest

from helpers import write_split


def make_recordings(rec_dir, rng, n_pairs=2, n_frames=12, h=48, w=64):
    """Synthetic orig/annot AVI pairs with a green-diff right-lane band."""
    os.makedirs(rec_dir, exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*"FFV1")
    for k in range(n_pairs):
        wo = cv2.VideoWriter(os.path.join(rec_dir, f"{k:03d}_orig.avi"),
                             fourcc, 30, (w, h), True)
        wa = cv2.VideoWriter(os.path.join(rec_dir, f"{k:03d}_annot.avi"),
                             fourcc, 30, (w, h), True)
        for _ in range(n_frames):
            orig = rng.integers(0, 100, (h, w, 3), dtype=np.uint8)
            annot = orig.copy()
            annot[h // 2:, w // 2:, 1] += 100   # green diff -> right lane
            wo.write(orig)
            wa.write(annot)
        wo.release()
        wa.release()


def test_postprocess_cli(tmp_path, rng):
    from sim2real_lane_segment_tpu.cli import postprocess

    rec = str(tmp_path / "recordings")
    out = str(tmp_path / "data")
    make_recordings(rec, rng)
    done = postprocess.main(["-id", rec, "-od", out])
    assert done == 2
    inputs = sorted(glob.glob(os.path.join(out, "input", "*.avi")))
    labels = sorted(glob.glob(os.path.join(out, "label", "*.avi")))
    assert len(inputs) == 2 and len(labels) == 2
    # decode a label frame: right-lane class must be present
    cap = cv2.VideoCapture(labels[0])
    ok, frame = cap.read()
    cap.release()
    assert ok
    classes = set(np.unique(frame))
    assert 1 in classes, f"classes found: {classes}"


def test_preprocess_db_cli(tmp_path, rng):
    from sim2real_lane_segment_tpu.cli import postprocess, preprocess_db

    rec = str(tmp_path / "recordings")
    data = str(tmp_path / "simData")
    make_recordings(rec, rng, n_pairs=3, n_frames=10)
    postprocess.main(["-id", rec, "-od", data])
    preprocess_db.main(["--dbType", "sim", "--dataPath", data])
    for split, lo, hi in [("train", 19, 23), ("valid", 3, 6), ("test", 3, 6)]:
        n = len(glob.glob(os.path.join(data, split, "input", "*.png")))
        assert lo <= n <= hi, f"{split}: {n}"
        assert n == len(glob.glob(os.path.join(data, split, "label", "*.png")))


def test_train_and_test_cli(tmp_path, rng):
    from sim2real_lane_segment_tpu.cli import test as test_cli
    from sim2real_lane_segment_tpu.cli import train as train_cli

    root = str(tmp_path / "simData")
    write_split(os.path.join(root, "train"), 8, rng)
    write_split(os.path.join(root, "valid"), 4, rng)
    write_split(os.path.join(root, "test"), 4, rng)

    res = train_cli.main([
        "--trainType", "sim", "--dataPath", root, "--arch", "tiny",
        "--max_epochs", "2", "-b", "4", "--height", "24", "--width", "32",
        "--default_root_dir", str(tmp_path / "results"),
        "--model_name", "tiny_smoke"])
    assert res["best_iou"] >= 0
    weights = os.path.join(res["out_dir"], "best_weights.msgpack")
    assert os.path.exists(weights)

    # hist_match CLI on the same tree (in-place rewrite)
    from sim2real_lane_segment_tpu.cli import hist_match
    n = hist_match.main(["--ds_source", os.path.join(root, "train"),
                         "--ds_reference", os.path.join(root, "test"),
                         "--batch_size", "4"])
    assert n == 8


def test_create_real_db_cli(tmp_path, rng):
    from sim2real_lane_segment_tpu.cli import create_real_db

    raw = tmp_path / "raw"
    raw.mkdir()
    for i in range(4):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(raw / f"f{i}.png"), img)
    # labelme-style JSON for two of them
    for i in range(2):
        ann = {"shapes": [
            {"label": "right", "shape_type": "polygon",
             "points": [[5, 5], [30, 5], [30, 30], [5, 30]]},
            {"label": "obstacle", "shape_type": "polygon",
             "points": [[40, 10], [60, 10], [60, 25], [40, 25]]},
        ]}
        with open(raw / f"f{i}.json", "w") as f:
            json.dump(ann, f)

    out = str(tmp_path / "realData")
    res = create_real_db.main(["--imgPath", str(raw), "--targetPath", out])
    assert res == {"labelled": 2, "unlabelled": 2}
    label = cv2.imread(os.path.join(out, "label", "000000.png"),
                       cv2.IMREAD_GRAYSCALE)
    assert set(np.unique(label)) == {0, 1, 3}

    # dry-run: no writes
    out2 = str(tmp_path / "realData2")
    create_real_db.main(["--imgPath", str(raw), "--targetPath", out2,
                         "--imitate"])
    assert not os.path.exists(out2)


def test_get_real_data_imitate_zero_egress(tmp_path, monkeypatch):
    """The packaged 78-URL manifest (reference utils/realVideoURLs.txt) is
    found by default and --imitate runs with no network and no writes."""
    from sim2real_lane_segment_tpu.cli import get_real_data

    monkeypatch.chdir(tmp_path)
    out = get_real_data.main(["--imitate"])
    assert out["urls"] == 78
    assert out["videos"] == 0
    assert not os.path.exists(tmp_path / "realVideos")


@pytest.mark.slow
def test_train_cyclegan_cli(tmp_path, rng):
    """Tiny end-to-end: train a 1-block cycle on two 8-image PNG domains,
    then feed the saved generator through sim2real_convert."""
    from sim2real_lane_segment_tpu.cli import sim2real_convert, train_cyclegan

    h, w = 16, 16
    for dom, shift in (("a", (0, 0, 60)), ("b", (60, 0, 0))):
        os.makedirs(tmp_path / dom, exist_ok=True)
        for i in range(8):
            img = rng.integers(0, 120, (h, w, 3), dtype=np.uint8)
            img += np.asarray(shift, np.uint8)
            cv2.imwrite(str(tmp_path / dom / f"{i:03d}.png"), img)
    out = str(tmp_path / "cg")
    res = train_cyclegan.main([
        "--source_dir", str(tmp_path / "a"), "--target_dir",
        str(tmp_path / "b"), "--out", out, "--epochs", "2", "-b", "4",
        "--width", str(w), "--height", str(h),
        "--num_residual_blocks", "1"])
    assert os.path.exists(os.path.join(out, "g_ab.msgpack"))
    assert os.path.exists(os.path.join(out, "history.jsonl"))
    assert np.isfinite(res["final"]["loss_G"])

    # converted DB tree: sim2real_convert must accept the trained weights
    db = tmp_path / "db" / "input"
    os.makedirs(db)
    for i in range(2):
        cv2.imwrite(str(db / f"{i:03d}.png"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    sim2real_convert.main(["--dataPath", str(tmp_path / "db"),
                           "--modelWeightsPath",
                           os.path.join(out, "g_ab.msgpack"),
                           "--num_residual_blocks", "1"])
    out_img = cv2.imread(str(db / "000.png"))
    assert out_img.shape == (480, 640, 3)  # reference re-upscale contract
