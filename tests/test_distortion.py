"""Fisheye distortion model: forward/inverse consistency, cv2 parity of
the undistort maps, and the distorted render path."""
import cv2
import numpy as np
import pytest

import jax

from sim2real_lane_segment_tpu.sim import distortion as D
from sim2real_lane_segment_tpu.sim import render
from sim2real_lane_segment_tpu.sim.maps import builtin_map


def test_forward_inverse_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.8, 0.8, 100)
    y = rng.uniform(-0.6, 0.6, 100)
    xd, yd = D.distort_normalized(x, y)
    xi, yi = D.invert_distort(xd, yd)
    np.testing.assert_allclose(xi, x, atol=1e-6)
    np.testing.assert_allclose(yi, y, atol=1e-6)


def test_undistort_maps_match_cv2():
    h, w = 480, 640
    mapx, mapy = D.undistort_maps(h, w)
    want_x, want_y = cv2.initUndistortRectifyMap(
        D.CAMERA_MATRIX, D.DIST_COEFS, np.eye(3),
        D.PROJECTION_MATRIX[:, :3], (w, h), cv2.CV_32FC1)
    np.testing.assert_allclose(mapx, want_x, atol=2e-2)
    np.testing.assert_allclose(mapy, want_y, atol=2e-2)


def test_distorted_ray_grid_shape_and_center():
    rays = D.distorted_ray_grid(120, 160)
    assert rays.shape == (120, 160, 3)
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
    # forward-looking ray near the principal point
    cy, cx = 231 * 120 // 480, 303 * 160 // 640
    assert rays[cy, cx, 2] > 0.99


def test_distorted_render_differs_from_pinhole():
    m = builtin_map("small_loop")
    scene = render.build_scene(m, 0)
    import jax.numpy as jnp
    pos = jnp.asarray([0.29 * m.tile_size, 1.5 * m.tile_size])
    angle = jnp.asarray(np.pi / 2)
    a = np.asarray(render.render_frame(scene, pos, angle,
                                       render.DRParams.default(),
                                       jax.random.key(0), height=60, width=80))
    b = np.asarray(render.render_frame(scene, pos, angle,
                                       render.DRParams.default(),
                                       jax.random.key(0), height=60, width=80,
                                       distortion=True))
    assert a.shape == b.shape
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 1.0
