"""Histogram matching vs a numpy oracle of skimage's algorithm.

Oracle mirrors skimage.exposure.match_histograms semantics on uint8 data
(the exact case the reference used via hist_match_datasets.py:28 with
img_as_float / img_as_ubyte wrappers).
"""
import numpy as np

from sim2real_lane_segment_tpu.ops.histmatch import match_histograms, match_histograms_batch


def oracle_match_channel(source, template):
    src_values, src_unique_indices, src_counts = np.unique(
        source.ravel(), return_inverse=True, return_counts=True)
    tmpl_values, tmpl_counts = np.unique(template.ravel(), return_counts=True)
    src_quantiles = np.cumsum(src_counts) / source.size
    tmpl_quantiles = np.cumsum(tmpl_counts) / template.size
    # reference path runs in img_as_float space then img_as_ubyte (rint)
    interp = np.interp(src_quantiles, tmpl_quantiles, tmpl_values / 255.0)
    out = interp[src_unique_indices].reshape(source.shape)
    return np.rint(np.clip(out, 0, 1) * 255).astype(np.uint8)


def oracle_match(source, template):
    return np.stack([oracle_match_channel(source[..., c], template[..., c])
                     for c in range(source.shape[-1])], axis=-1)


def assert_close_u8(got, want, max_frac=0.01):
    """Exact up to the documented float32-vs-float64 ±1 rounding tolerance."""
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()} > 1 level"
    frac = (diff > 0).mean()
    assert frac <= max_frac, f"{frac:.2%} pixels differ (> {max_frac:.0%})"


def test_match_uniform_vs_skewed(rng):
    src = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
    tmpl = (rng.integers(0, 128, (50, 70, 3)) ** 2 // 64).astype(np.uint8)
    got = np.asarray(match_histograms(src, tmpl))
    want = oracle_match(src, tmpl)
    assert_close_u8(got, want)


def test_match_sparse_template(rng):
    # template with big gaps in the value range (absent values)
    src = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    tmpl = rng.choice(np.array([3, 17, 120, 200, 255], np.uint8), (30, 30, 3))
    got = np.asarray(match_histograms(src, tmpl))
    want = oracle_match(src, tmpl)
    assert_close_u8(got, want)


def test_match_identity(rng):
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    got = np.asarray(match_histograms(img, img))
    np.testing.assert_array_equal(got, img)


def test_constant_template(rng):
    src = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    tmpl = np.full((20, 20, 3), 99, np.uint8)
    got = np.asarray(match_histograms(src, tmpl))
    np.testing.assert_array_equal(got, np.full_like(src, 99))


def test_batched(rng):
    srcs = rng.integers(0, 256, (3, 40, 40, 3), dtype=np.uint8)
    tmpls = rng.integers(0, 200, (3, 30, 30, 3), dtype=np.uint8)
    got = np.asarray(match_histograms_batch(srcs, tmpls))
    for i in range(3):
        assert_close_u8(got[i], oracle_match(srcs[i], tmpls[i]))
