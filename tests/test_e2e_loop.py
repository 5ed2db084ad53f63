"""End-to-end loop closure: circular trajectory returning to its start.

The camera drives a full circle inside the textured box; accumulated drift
should be corrected when the loop is detected (EuRoC-loop analog of
BASELINE.json config 3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.io import synthetic
from asdslam_tpu.models import patch_descriptor
from asdslam_tpu.system import System
from asdslam_tpu.utils import evaluate


def loop_config():
    return SlamConfig(
        n_features=600,
        n_levels=4,
        image_width=320,
        image_height=240,
        fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        min_match_count=60,
        local_ba_max_points=2048,
        local_ba_max_obs=8192,
        max_keyframes=128,
        max_map_points=32768,
        vocab_branching=6,
        vocab_depth=3,
        loop_min_total_matches=30,
    )


class TestLoopClosure:
    # always-on: with the persistent compilation cache warm this runs in
    # ~1 min and is the only end-to-end cover of CorrectLoop (essential
    # graph + global BA)
    def test_circular_loop(self):
        cfg = loop_config()
        K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
        n_frames = 155
        # full circle (110 frames) + 45 frames of revisit so the loop zone
        # spans several keyframes (the 3-consecutive consistency gate needs it)
        frames, poses = synthetic.render_sequence(
            K, n_frames=n_frames, height=cfg.image_height, width=cfg.image_width,
            step=0.22, turn=2 * np.pi / 110,
            scene=synthetic.Scene(floor_y=2.0, ceil_y=-3.0, left_x=-8.0, right_x=8.0,
                                  back_z=-8.0, front_z=16.0))
        sys_ = System(cfg, descriptor_fn=patch_descriptor.apply, do_loop_closing=True)
        for i in range(n_frames):
            sys_.track_monocular(frames[i], i)
        stats = sys_.stats()
        assert stats["n_keyframes"] >= 8, stats
        # loop should have been detected and closed
        assert sys_.loop_closer is not None
        assert sys_.loop_closer.n_loops_closed >= 1, (
            stats, "no loop closed")

        est = evaluate.camera_centers(
            [(fid, p) for fid, p in sys_.keyframe_trajectory()])
        gt = evaluate.camera_centers(
            [(i, np.asarray(poses[i])) for i in range(n_frames)])
        e, g = evaluate.associate_by_id(est, gt)
        ate = evaluate.ate_rmse(e, g, align="sim3")
        path_len = float(np.linalg.norm(np.diff(g, axis=0), axis=1).sum())
        # after loop closure the ATE should be a small fraction of the path
        # (measured 0.11 m / 33.6 m = 0.33% at the time of writing)
        assert ate < 0.02 * path_len, f"ATE {ate:.3f} m over {path_len:.1f} m"
