"""Round-trip tests for the extended camera models (aslam_cv2 parity)."""

import numpy as np
import jax.numpy as jnp

from asdslam_tpu.geometry import camera_models as cm


def test_equidistant_roundtrip():
    d = cm.EquidistantDistortion.create(k1=-0.01, k2=0.003, k3=-0.002, k4=0.0005)
    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.uniform(-0.6, 0.6, (200, 2)), jnp.float32)
    xd = cm.equidistant_distort(d, xn)
    xu = cm.equidistant_undistort(d, xd, iters=10)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=2e-4)


def test_fisheye_roundtrip():
    d = cm.FisheyeDistortion.create(w=0.9)
    rng = np.random.default_rng(1)
    xn = jnp.asarray(rng.uniform(-0.8, 0.8, (200, 2)), jnp.float32)
    xd = cm.fisheye_distort(d, xn)
    xu = cm.fisheye_undistort(d, xd)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-4)


def test_fisheye_center_continuity():
    d = cm.FisheyeDistortion.create(w=0.9)
    xn = jnp.asarray([[0.0, 0.0], [1e-6, 0.0]], jnp.float32)
    xd = np.asarray(cm.fisheye_distort(d, xn))
    assert np.isfinite(xd).all()
    np.testing.assert_allclose(xd[0], 0.0)


def test_unified_project_backproject():
    cam = cm.UnifiedCamera.create(xi=0.8, fx=300.0, fy=300.0, cx=320.0, cy=240.0)
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 0.5
    uv = cm.unified_project(cam, jnp.asarray(pts))
    rays = np.asarray(cm.unified_backproject(cam, uv))
    # backprojected ray must be parallel to the original point direction
    dirs = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    cos = np.sum(rays * dirs, axis=1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)
