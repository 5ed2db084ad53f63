"""Reference-protocol frame-trajectory recomposition.

The reference stores each frame's pose RELATIVE to its reference keyframe
and recomposes at save time, so loop/GBA corrections retroactively repair
the whole frame trajectory (System::SaveTrajectoryTUM,
/root/reference/src/vslam/src/System.cc:482-541; Tcr pushed per frame at
Tracking.cc:371-375; spanning-tree walk for culled KFs at 523-528).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.io import synthetic
from asdslam_tpu.models import patch_descriptor
from asdslam_tpu.system import System
from asdslam_tpu.utils import evaluate
from asdslam_tpu.frontend.tracking import _apply_delta_host, _kf_rt


def small_config(**kw):
    return SlamConfig(
        n_features=600, n_levels=4, image_width=320, image_height=240,
        fx=260.0, fy=260.0, cx=160.0, cy=120.0, min_match_count=60,
        local_ba_max_points=2048, local_ba_max_obs=8192,
        max_keyframes=64, max_map_points=16384, **kw)


class TestRecomposeUnit:
    def _mk_system(self):
        return System(small_config(), descriptor_fn=patch_descriptor.apply)

    def test_correction_propagates_to_frames(self):
        """Moving the ref KF's pose after the fact must move the recomposed
        frame pose with it, preserving the stored relative transform."""
        sys = self._mk_system()
        s = sys.store
        import jax

        feat = sys.extract(jnp.zeros((240, 320)))
        pose_kf = np.array([1, 0, 0, 0, 0.5, -0.2, 1.0], np.float32)
        k = s.add_keyframe(pose_kf, 0, feat)
        # frame pose: small motion past the KF
        pose_f = np.array([0.9689, 0.0, 0.2474, 0.0, 0.55, -0.2, 1.4],
                          np.float32)
        tr = sys.tracker
        tr.ref_kf = k
        tr.last_pose = pose_f
        tr._append_traj(7)
        assert tr.rel_traj[-1][1] == k

        # simulate a loop/GBA correction of the KF
        new_pose_kf = np.array([0.9950, 0.0, 0.0998, 0.0, 2.0, 0.3, -1.0],
                               np.float32)
        s.set_kf_pose(k, new_pose_kf)
        rec = dict((fid, p) for fid, p in sys.frame_trajectory_recomposed())
        # expected: Tcr (captured against the OLD kf pose) composed on NEW
        Rr, trr = _kf_rt(pose_kf)
        Rc, tc = _kf_rt(pose_f)
        Rcr = Rc @ Rr.T
        tcr = tc - Rcr @ trr
        from asdslam_tpu.system import _mat_to_quat_np
        rel = np.concatenate([_mat_to_quat_np(Rcr), tcr]).astype(np.float32)
        expect = _apply_delta_host(rel, new_pose_kf)
        Re, te = _kf_rt(expect)
        Rg, tg = _kf_rt(rec[7])
        np.testing.assert_allclose(Rg, Re, atol=1e-5)
        np.testing.assert_allclose(tg, te, atol=1e-5)

    def test_culled_ref_walks_spanning_tree(self):
        """A culled ref KF bridges through its cull-time relative pose to
        the surviving parent (System.cc:523-528 semantics)."""
        sys = self._mk_system()
        s = sys.store
        feat = sys.extract(jnp.zeros((240, 320)))
        p_parent = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        p_child = np.array([1, 0, 0, 0, 0, 0, 1.0], np.float32)
        kp = s.add_keyframe(p_parent, 0, feat)
        kc = s.add_keyframe(p_child, 1, feat)
        s.kf_parent[kc] = kp

        tr = sys.tracker
        tr.ref_kf = kc
        tr.last_pose = np.array([1, 0, 0, 0, 0, 0, 1.5], np.float32)
        tr._append_traj(3)

        # cull the child through the mapper's path (captures kf_cull_rel)
        sys.local_mapper._erase_keyframe(kc)
        assert not s.kf_valid[kc] and s.kf_cull_parent[kc] == kp

        # move the parent afterwards; frame must follow parent + chain
        p_parent2 = np.array([1, 0, 0, 0, 1.0, 0, 0], np.float32)
        s.set_kf_pose(kp, p_parent2)
        rec = dict((fid, p) for fid, p in sys.frame_trajectory_recomposed())
        # T_cw = Tcr(child) o Tcp(child->parent) o T_parent_new
        #      = [0,0,0.5] o [0,0,1.0] o [1,0,0] translations (identity rots)
        np.testing.assert_allclose(rec[3][4:], [1.0, 0.0, 1.5], atol=1e-5)

    def test_recomposed_matches_live_without_corrections(self):
        """On a short clean run with no loop closures, recomposed and live
        frame trajectories agree to local-BA adjustment scale."""
        cfg = small_config()
        K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
        frames, poses = synthetic.render_sequence(
            K, n_frames=20, height=cfg.image_height, width=cfg.image_width,
            step=0.25, turn=0.004)
        sys = System(cfg, descriptor_fn=patch_descriptor.apply)
        for i in range(frames.shape[0]):
            sys.track_monocular(frames[i], i)
        sys.finish()
        live = evaluate.camera_centers(sys.frame_trajectory())
        rec = evaluate.camera_centers(sys.frame_trajectory_recomposed())
        common = sorted(set(live) & set(rec))
        assert len(common) >= 10
        d = np.array([np.linalg.norm(live[i] - rec[i]) for i in common])
        # poses differ only by post-hoc local-BA adjustments of the ref KFs
        assert float(d.max()) < 0.25, d.max()
