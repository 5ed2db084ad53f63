"""End-to-end SLAM with a distorting (radtan) camera.

The reference undistorts every frame's keypoints before any geometry
(Frame::UndistortKeyPoints, src/vslam/src/Frame.cc:298-328; full-image
cv::undistort at Tracking.cc:104) — EuRoC's camera has strong radial
distortion (cameraconfig/MH_EUROC/EuRoC_config.txt: k1=-0.283).  This test
renders a sequence through a distorting lens and verifies:

1. the System wires `with_undistortion` when cfg.dist_coeffs != 0 and
   produces uv_und != uv,
2. tracking through the distorted sequence reaches the same ATE contract as
   the distortion-free e2e test,
3. ignoring the distortion (the pre-fix behaviour) measurably degrades
   geometry — the regression guard for the wiring.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.io import synthetic
from asdslam_tpu.models import patch_descriptor
from asdslam_tpu.system import System
from asdslam_tpu.utils import evaluate

# EuRoC-magnitude radial distortion
DIST = (-0.28, 0.07, 0.0, 0.0)


def distorted_config():
    return SlamConfig(
        n_features=600,
        n_levels=4,
        image_width=320,
        image_height=240,
        fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        dist_coeffs=DIST,
        min_match_count=60,
        local_ba_max_points=2048,
        local_ba_max_obs=8192,
        max_keyframes=64,
        max_map_points=16384,
    )


@pytest.fixture(scope="module")
def distorted_sequence():
    cfg = distorted_config()
    K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
    frames, poses = synthetic.render_sequence(
        K, n_frames=30, height=cfg.image_height, width=cfg.image_width,
        step=0.25, turn=0.004, dist=DIST)
    return cfg, frames, poses


class TestUndistortionWiring:
    def test_extractor_undistorts_keypoints(self, distorted_sequence):
        cfg, frames, poses = distorted_sequence
        sys = System(cfg, descriptor_fn=patch_descriptor.apply)
        feat = sys.extract(frames[0])
        uv = np.asarray(feat.uv)[np.asarray(feat.valid)]
        und = np.asarray(feat.uv_und)[np.asarray(feat.valid)]
        # near the border the radial correction is large; near centre ~0
        shift = np.linalg.norm(und - uv, axis=1)
        assert shift.max() > 2.0, shift.max()
        r = np.linalg.norm(uv - np.array([cfg.cx, cfg.cy]), axis=1)
        assert shift[np.argmin(r)] < shift[np.argmax(r)]

    def test_bounds_extend_beyond_image(self):
        cfg = distorted_config()
        x0, x1, y0, y1 = cfg.undistorted_bounds
        # barrel distortion (k1<0): undistorted corners move OUTWARD
        assert x0 < 0 and y0 < 0
        assert x1 > cfg.image_width and y1 > cfg.image_height

    def test_full_slam_distorted(self, distorted_sequence):
        cfg, frames, poses = distorted_sequence
        sys = System(cfg, descriptor_fn=patch_descriptor.apply)
        tracked = 0
        for i in range(frames.shape[0]):
            pose = sys.track_monocular(frames[i], i)
            if pose is not None:
                tracked += 1
        stats = sys.stats()
        assert stats["n_keyframes"] >= 2, stats
        assert tracked >= frames.shape[0] * 0.6, (tracked, stats)

        est = evaluate.camera_centers(sys.frame_trajectory())
        gt = evaluate.camera_centers(
            [(i, np.asarray(poses[i])) for i in range(frames.shape[0])])
        e, g = evaluate.associate_by_id(est, gt)
        assert len(e) >= 15
        ate = evaluate.ate_rmse(e, g, align="sim3")
        assert ate < 0.5, f"ATE {ate:.3f} m"
        self._ate_with = ate

    def test_ignoring_distortion_degrades(self):
        """Pre-fix behaviour guard: strongly distorted frames + turning
        motion, tracked twice — with the distortion declared (undistortion
        wired) and with dist_coeffs zeroed (pre-fix behaviour).  The naive
        run must be clearly worse (measured: 0.041 m vs 0.168 m ATE)."""
        strong = (-0.45, 0.15, 0.0, 0.0)
        cfg = distorted_config().replace(dist_coeffs=strong)
        K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
        frames, poses = synthetic.render_sequence(
            K, n_frames=30, height=cfg.image_height, width=cfg.image_width,
            step=0.25, turn=0.03, dist=strong)
        ates = {}
        for label, c in [("with", cfg),
                         ("without", cfg.replace(dist_coeffs=(0.0,) * 4))]:
            sys = System(c, descriptor_fn=patch_descriptor.apply)
            for i in range(frames.shape[0]):
                sys.track_monocular(frames[i], i)
            est = evaluate.camera_centers(sys.frame_trajectory())
            gt = evaluate.camera_centers(
                [(i, np.asarray(poses[i])) for i in range(frames.shape[0])])
            e, g = evaluate.associate_by_id(est, gt)
            ates[label] = (evaluate.ate_rmse(e, g, align="sim3")
                           if len(e) >= 10 else float("inf"))
        assert ates["with"] < 0.15, ates
        assert ates["without"] > 2.0 * ates["with"], ates
