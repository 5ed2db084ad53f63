"""Pipelined tracking + asynchronous mapping (frontend/tracking.py).

The reference is fully synchronous (SURVEY.md intro: the fork runs
single-threaded; Tracking.cc:797 calls DoMapping inline).  The TPU build
adds two latency-hiding mechanisms with NO reference counterpart —
dispatch-ahead pipelining (frame t+1's fused kernel launches before frame
t's result is synced) and an asynchronous mapping worker with a
DETERMINISTIC join point (cfg.mapping_overlap_frames after the keyframe).
These tests pin the contracts that make them safe:

1. determinism — two identical runs produce bit-identical trajectories and
   map statistics (the join rule depends on frame ids, never wall-clock);
2. quality parity with the synchronous mode on the same sequence;
3. flush() drains the deferred frame so no pose is lost.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.io import synthetic
from asdslam_tpu.models import patch_descriptor
from asdslam_tpu.system import System
from asdslam_tpu.utils import evaluate


def small_config(**kw):
    return SlamConfig(
        n_features=600,
        n_levels=4,
        image_width=320,
        image_height=240,
        fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        min_match_count=60,
        local_ba_max_points=2048,
        local_ba_max_obs=8192,
        max_keyframes=64,
        max_map_points=16384,
        **kw,
    )


@pytest.fixture(scope="module")
def sequence():
    cfg = small_config()
    K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
    frames, poses = synthetic.render_sequence(
        K, n_frames=30, height=cfg.image_height, width=cfg.image_width,
        step=0.25, turn=0.004)
    return frames, poses


def run(cfg, frames):
    sys = System(cfg, descriptor_fn=patch_descriptor.apply)
    returned = 0
    for i in range(frames.shape[0]):
        if sys.track_monocular(frames[i], i) is not None:
            returned += 1
    sys.finish()
    return sys, returned


def ate_of(sys, frames, poses):
    est = evaluate.camera_centers(sys.frame_trajectory())
    gt = evaluate.camera_centers(
        [(i, np.asarray(poses[i])) for i in range(frames.shape[0])])
    e, g = evaluate.associate_by_id(est, gt)
    return evaluate.ate_rmse(e, g, align="sim3"), len(e)


class TestPipelined:
    def test_deterministic(self, sequence):
        """Two identical pipelined+async runs must agree exactly: the
        mapping join fires at a fixed frame offset, so thread completion
        time never influences any result."""
        frames, poses = sequence
        cfg = small_config(pipelined_tracking=True, async_mapping=True)
        s1, _ = run(cfg, frames)
        s2, _ = run(cfg, frames)
        t1, t2 = s1.frame_trajectory(), s2.frame_trajectory()
        assert len(t1) == len(t2) and len(t1) > 0
        for (i1, p1), (i2, p2) in zip(t1, t2):
            assert i1 == i2
            np.testing.assert_array_equal(p1, p2)
        assert s1.stats() == s2.stats()

    def test_quality_matches_sync_mode(self, sequence):
        """Bounded staleness (tracking against the pre-KF map for up to
        mapping_overlap_frames) must not change tracking quality class."""
        frames, poses = sequence
        s_pipe, _ = run(small_config(pipelined_tracking=True,
                                     async_mapping=True), frames)
        s_sync, _ = run(small_config(pipelined_tracking=False,
                                     async_mapping=False), frames)
        ate_p, n_p = ate_of(s_pipe, frames, poses)
        ate_s, n_s = ate_of(s_sync, frames, poses)
        assert n_p >= 15 and n_s >= 15
        assert ate_p < 0.5, f"pipelined ATE {ate_p:.3f}"
        assert ate_s < 0.5, f"sync ATE {ate_s:.3f}"

    def test_flush_drains_deferred_frame(self, sequence):
        """In pipelined mode the last frame's pose is deferred; finish()
        must deliver it (every processed frame appears in the trajectory)."""
        frames, poses = sequence
        cfg = small_config(pipelined_tracking=True, async_mapping=True)
        sys, returned = run(cfg, frames)
        traj_ids = [i for i, _ in sys.frame_trajectory()]
        # all but the few initialization frames must be present, including
        # the final frame (only delivered by the flush)
        assert frames.shape[0] - 1 in traj_ids
        assert len(traj_ids) >= frames.shape[0] * 0.6
        # flush is idempotent
        sys.finish()
        assert len(sys.frame_trajectory()) == len(traj_ids)

    def test_no_worker_left_running(self, sequence):
        frames, _ = sequence
        cfg = small_config(pipelined_tracking=True, async_mapping=True)
        sys, _ = run(cfg, frames)
        assert sys.tracker._map_thread is None
        assert sys.tracker._pend is None
