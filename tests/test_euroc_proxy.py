"""EuRoC-analog proxy validation (BASELINE config 3): aggressive 6-DoF MAV
motion through the hall world, rendered through the REAL EuRoC cam0 radtan
distortion (cameraconfig/MH_EUROC/EuRoC_config.txt), tracked end-to-end with
undistortion active.  The full-scale run (752x480, 1300 frames, closed loop)
is the TPU eval (eval_euroc_proxy.py); this test exercises the same path at
reduced scale on the CPU mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.io import euroc_proxy
from asdslam_tpu.models import patch_descriptor
from asdslam_tpu.system import System
from asdslam_tpu.utils import evaluate


class TestEurocProxy:
    def test_trajectory_is_six_dof_and_closed(self):
        pose7, c = euroc_proxy.mav_trajectory(1300, loop_frames=1200)
        step = np.linalg.norm(np.diff(c, axis=0), axis=1)
        assert 0.02 < step.mean() < 0.1          # MAV speed at 20 Hz
        # per-frame rotation well above KITTI's planar motion, not violent
        q = pose7[:, :4]
        dots = np.abs((q[1:] * q[:-1]).sum(1)).clip(-1, 1)
        ang = 2 * np.arccos(dots)
        assert 0.005 < ang.mean() < 0.05
        # genuinely 6-DoF: significant vertical travel and roll
        assert np.ptp(c[:, 1]) > 2.0
        # closed: the tail revisits the start region
        assert np.linalg.norm(c[1250] - c[50]) < 1.0

    def test_rendered_distortion_matches_model(self):
        """A world point projected with the radtan forward model must land on
        the same pixel that ray-casts to it — the rendered image genuinely
        carries the configured distortion."""
        xn, yn = euroc_proxy.distorted_ray_grid(
            euroc_proxy.EUROC_W, euroc_proxy.EUROC_H,
            euroc_proxy.EUROC_FX, euroc_proxy.EUROC_FY,
            euroc_proxy.EUROC_CX, euroc_proxy.EUROC_CY, euroc_proxy.EUROC_DIST)
        k1, k2, p1, p2 = euroc_proxy.EUROC_DIST
        for (v, u) in [(10, 20), (240, 376), (400, 700), (30, 740)]:
            x, y = float(xn[v, u]), float(yn[v, u])
            r2 = x * x + y * y
            radial = 1.0 + k1 * r2 + k2 * r2 * r2
            xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
            yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
            u_f = xd * euroc_proxy.EUROC_FX + euroc_proxy.EUROC_CX
            v_f = yd * euroc_proxy.EUROC_FY + euroc_proxy.EUROC_CY
            assert abs(u_f - u) < 0.05 and abs(v_f - v) < 0.05, (u, v, u_f, v_f)

    def test_e2e_tracking_with_distortion(self):
        seq = euroc_proxy.EurocProxySequence(n_frames=60, scale=0.4)
        cfg = seq.config(SlamConfig(
            n_features=600, n_levels=4, min_match_count=60,
            local_ba_max_points=2048, local_ba_max_obs=8192,
            max_keyframes=64, max_map_points=16384))
        assert cfg.has_distortion
        sys = System(cfg, descriptor_fn=patch_descriptor.apply)
        for i in range(len(seq)):
            ts, img = seq[i]
            sys.track_monocular(img, i)
        stats = sys.stats()
        assert stats["n_frames_tracked"] >= 40, stats
        est = evaluate.camera_centers(sys.frame_trajectory())
        gt = evaluate.camera_centers(
            [(i, seq.gt_pose7[i]) for i in range(len(seq))])
        e, g = evaluate.associate_by_id(est, gt)
        ate = evaluate.ate_rmse(e, g, align="sim3")
        # ~2.8 m of path at 0.4 scale: sub-decimetre tracking expected
        assert ate < 0.15, ate
