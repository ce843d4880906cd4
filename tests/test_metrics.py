"""Metric semantics vs independent numpy oracles of the PL-1.x formulas
used by the reference (TrainingBase.py:79-110, test.py:96-115)."""
import numpy as np

from sim2real_lane_segment_tpu.ops import metrics as MM


def np_confusion(pred, target, n):
    cm = np.zeros((n, n), np.int64)
    for t, p in zip(target.reshape(-1), pred.reshape(-1)):
        cm[t, p] += 1
    return cm


def np_iou_pl(pred, target, num_classes):
    """PL 1.x iou with num_classes inferred from data max."""
    n = int(max(pred.max(), target.max())) + 1
    cm = np_confusion(pred, target, max(n, num_classes))
    inter = np.diag(cm).astype(float)
    union = cm.sum(0) + cm.sum(1) - inter
    scores = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    return scores[:n].sum() / n


def np_dice_pl(pred, target, num_classes):
    """PL 1.x dice_score: mean over classes 1..C-1, absent-in-target -> 0."""
    scores = []
    for c in range(1, num_classes):
        if not (target == c).any():
            scores.append(0.0)
            continue
        tp = ((pred == c) & (target == c)).sum()
        fp = ((pred == c) & (target != c)).sum()
        fn = ((pred != c) & (target == c)).sum()
        denom = 2 * tp + fp + fn
        scores.append(2 * tp / denom if denom > 0 else 0.0)
    return float(np.mean(scores))


def test_accuracy(rng):
    pred = rng.integers(0, 4, (2, 30, 40))
    target = rng.integers(0, 4, (2, 30, 40))
    got = float(MM.accuracy(pred, target))
    np.testing.assert_allclose(got, (pred == target).mean(), rtol=1e-6)


def test_confusion_matrix(rng):
    pred = rng.integers(0, 4, (3, 30, 40))
    target = rng.integers(0, 4, (3, 30, 40))
    got = np.asarray(MM.confusion_matrix(pred, target, 4))
    np.testing.assert_array_equal(got, np_confusion(pred, target, 4))


def test_iou_all_classes_present(rng):
    pred = rng.integers(0, 4, (2, 30, 40))
    target = rng.integers(0, 4, (2, 30, 40))
    got = float(MM.iou(pred, target, 4))
    np.testing.assert_allclose(got, np_iou_pl(pred, target, 4), rtol=1e-5)


def test_iou_missing_top_class(rng):
    # Class 3 absent in both pred and target -> PL averages over 3 classes.
    pred = rng.integers(0, 3, (30, 40))
    target = rng.integers(0, 3, (30, 40))
    got = float(MM.iou(pred, target, 4))
    np.testing.assert_allclose(got, np_iou_pl(pred, target, 4), rtol=1e-5)


def test_iou_perfect():
    target = np.tile(np.arange(4), 100).reshape(20, 20)
    assert float(MM.iou(target, target, 4)) == 1.0


def test_dice(rng):
    pred = rng.integers(0, 4, (2, 30, 40))
    target = rng.integers(0, 4, (2, 30, 40))
    got = float(MM.dice_score(pred, target, 4))
    np.testing.assert_allclose(got, np_dice_pl(pred, target, 4), rtol=1e-5)


def test_dice_absent_class(rng):
    pred = rng.integers(0, 4, (30, 40))
    target = rng.integers(0, 2, (30, 40))  # classes 2,3 absent
    got = float(MM.dice_score(pred, target, 4))
    np.testing.assert_allclose(got, np_dice_pl(pred, target, 4), rtol=1e-5)


def test_evaluate_and_summarize(rng):
    outs = []
    for n in (8, 8, 5):  # ragged final batch
        probas = rng.random((n, 12, 16, 4)).astype(np.float32)
        target = rng.integers(0, 4, (n, 12, 16))
        d = MM.evaluate_outputs(probas, target, loss=np.float32(0.5), num_classes=4)
        assert float(d["weight"]) == n
        outs.append(d)
    logs = MM.summarize_weighted(outs)
    assert set(logs) == {"loss", "acc", "dice", "iou"}
    np.testing.assert_allclose(logs["loss"], 0.5, rtol=1e-6)
    assert 0 <= logs["acc"] <= 100 and 0 <= logs["iou"] <= 100
