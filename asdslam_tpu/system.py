"""System facade: wires extractor, tracker, local mapper, (loop closer).

Mirror of src/vslam/src/System.cc — construction (System.cc:112-144),
TrackMonocular (146-150), trajectory export (SaveKeyFrameTrajectoryTUM,
446-480).  Map persistence and localization mode are layered on in
asdslam_tpu.mapping.persistence.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.frontend import extractor as extractor_mod
from asdslam_tpu.frontend.tracking import Tracker
from asdslam_tpu.backend.local_mapping import LocalMapper
from asdslam_tpu.mapping.map_store import MapStore, _pose_np
from asdslam_tpu.models import asdnet


class System:
    def __init__(self, cfg: SlamConfig, asdnet_params=None, do_loop_closing: bool = False,
                 descriptor_fn=None, localization_mode: bool = False):
        """localization_mode: track against a prior map (load_map) without
        extending it — System(loop_for_loc)/TrackLocalization parity."""
        self.localization_mode = localization_mode
        self.cfg = cfg
        self.K = jnp.array(
            [[cfg.fx, 0.0, cfg.cx], [0.0, cfg.fy, cfg.cy], [0.0, 0.0, 1.0]],
            jnp.float32)

        rotate_patches = False
        if descriptor_fn is None:
            if cfg.use_orb:
                # --use_orb: classic binary descriptor (rotation-normalized)
                from asdslam_tpu.ops import orb
                descriptor_fn = orb.apply
                rotate_patches = True
            else:
                if asdnet_params is None:
                    asdnet_params = asdnet.init_params(jax.random.PRNGKey(0))
                self.asdnet_params = asdnet_params
                descriptor_fn = lambda patches: asdnet.apply(asdnet_params, patches)
        self.extract = extractor_mod.make_extractor(cfg, descriptor_fn, rotate_patches)
        if cfg.has_distortion:
            # undistort keypoints at extraction (Frame::UndistortKeyPoints,
            # Frame.cc:298-328); downstream projection stays pinhole on
            # uv_und like the reference (EuRoC's radtan camera needs this)
            from asdslam_tpu.geometry import camera as camera_mod
            cam = camera_mod.Camera.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy,
                                           *cfg.dist_coeffs)
            self.extract = extractor_mod.with_undistortion(self.extract, cam)

        self.store = MapStore(cfg.max_keyframes, cfg.max_map_points,
                              cfg.n_features, cfg.max_obs_per_point)
        self.loop_closer = None
        if do_loop_closing or localization_mode:
            from asdslam_tpu.loop.loop_closing import LoopCloser
            self.loop_closer = LoopCloser(cfg, self.K, self.store)
            self.loop_closer.only_global_map = localization_mode
        self.local_mapper = LocalMapper(cfg, self.K, self.store, self.loop_closer)
        self.tracker = Tracker(cfg, self.K, self.extract, self.store,
                               self.local_mapper, localization_only=localization_mode)
        from asdslam_tpu.utils.tracing import Tracer
        self.tracer = Tracer()
        self.tracker.tracer = self.tracer
        self.local_mapper.tracer = self.tracer
        if self.loop_closer is not None:
            self.loop_closer.tracer = self.tracer

    def track_monocular(self, image, frame_id: int) -> Optional[np.ndarray]:
        """image: [H, W] — float32 in [0, 1] or uint8 in [0, 255] (uint8
        uploads 4x less and is converted on device).  Returns pose7 T_cw or
        None."""
        img = jnp.asarray(image)
        if not jnp.issubdtype(img.dtype, jnp.integer):
            img = img.astype(jnp.float32)
        with self.tracer.span("frame"):
            return self.tracker.process(img, frame_id)

    def finish(self):
        """Drain the pipelined tracker (deferred frame + outstanding
        asynchronous mapping).  Idempotent; called automatically by the
        trajectory/stats/save accessors so results are always complete."""
        self.tracker.flush()

    # ------------------------------------------------------------------ #
    def keyframe_trajectory(self):
        """[(frame_id, pose7 T_cw)] for all keyframes."""
        self.finish()
        s = self.store
        return [(int(s.kf_frame_id[k]), s.kf_pose[k].copy())
                for k in range(s.n_kf) if s.kf_valid[k]]

    def frame_trajectory(self):
        self.finish()
        return list(self.tracker.trajectory)

    def frame_trajectory_recomposed(self):
        """Reference-protocol frame trajectory (System::SaveTrajectoryTUM,
        src/vslam/src/System.cc:482-541): each frame's stored ref-KF-relative
        pose (Tracking.cc:371-375) composed onto the ref KF's FINAL optimized
        pose, walking cull-time relative links (System.cc:523-528) when the
        ref KF was culled.  Loop closures and GBA therefore retroactively
        repair the whole frame trajectory — this is the trajectory the
        reference evaluates; the live ``frame_trajectory`` is the stricter
        poses-as-estimated-online variant."""
        self.finish()
        from asdslam_tpu.frontend.tracking import _apply_delta_host
        s = self.store
        out = []
        for fid, ref, rel in self.tracker.rel_traj:
            if ref < 0:
                out.append((fid, np.asarray(rel).copy()))
                continue
            T = np.asarray(rel)
            k = int(ref)
            guard = 0
            while (not s.kf_valid[k] and s.kf_cull_parent[k] >= 0
                   and guard < 256):
                T = _apply_delta_host(T, s.kf_cull_rel[k])
                k = int(s.kf_cull_parent[k])
                guard += 1
            if not s.kf_valid[k]:
                continue  # no surviving anchor: skip (reference drops too)
            out.append((fid, _apply_delta_host(T, s.kf_pose[k])))
        return out

    def save_frame_trajectory_tum(self, path: str, timestamps=None,
                                  recomposed: bool = True):
        """System::SaveTrajectoryTUM parity: per-FRAME trajectory in TUM
        format, recomposed through the final keyframe poses by default."""
        traj = (self.frame_trajectory_recomposed() if recomposed
                else self.frame_trajectory())
        with open(path, "w") as f:
            for frame_id, pose7 in traj:
                R, t = _pose_np(pose7)
                Rwc = R.T
                twc = -R.T @ t
                q = _mat_to_quat_np(Rwc)
                ts = frame_id if timestamps is None else timestamps[frame_id]
                f.write("%f %f %f %f %f %f %f %f\n" % (
                    ts, twc[0], twc[1], twc[2], q[1], q[2], q[3], q[0]))

    def save_trajectory_tum(self, path: str, timestamps=None):
        """TUM format: ts tx ty tz qx qy qz qw, pose = T_wc (inverted)."""
        with open(path, "w") as f:
            for frame_id, pose7 in self.keyframe_trajectory():
                R, t = _pose_np(pose7)
                Rwc = R.T
                twc = -R.T @ t
                q = _mat_to_quat_np(Rwc)
                ts = frame_id if timestamps is None else timestamps[frame_id]
                f.write("%f %f %f %f %f %f %f %f\n" % (
                    ts, twc[0], twc[1], twc[2], q[1], q[2], q[3], q[0]))

    def save_map(self, path: str):
        """Binary .map checkpoint (visual_map format parity — System.cc:437)."""
        self.finish()
        from asdslam_tpu.mapping import persistence
        data = persistence.export_map(self.store, self.cfg,
                                      self.cfg.covis_weight_posegraph)
        persistence.save_visual_map(data, path)

    def load_map(self, path: str):
        """Load a .map into the (empty) store — System::LoadORBMap.  In
        localization mode also builds the relocalization BoW database."""
        from asdslam_tpu.mapping import persistence
        data = persistence.load_visual_map(path)
        persistence.import_map(data, self.store,
                               np.asarray(self.cfg.scale_factors, np.float32))
        if self.localization_mode and self.loop_closer is not None:
            lc = self.loop_closer
            if lc.vocab is None:
                # no offline vocabulary supplied: train one from the loaded
                # map's own descriptors
                lc.pending = list(range(self.store.n_kf))
                lc._train_vocab()
            else:
                # offline vocabulary (train_vocab.py / --voc_addr): index the
                # prior map's keyframes under it
                for kf in range(self.store.n_kf):
                    lc._add_kf_bow(kf)
                    lc.db.add(kf, lc.kf_bow[kf])

    def stats(self):
        # NOTE: deliberately does NOT flush the pipeline — it is called from
        # per-frame progress prints, and a flush there would break the
        # dispatch-ahead overlap.  Counts may lag by one frame.
        s = self.store
        return {
            "n_keyframes": int(s.kf_valid.sum()),
            "n_map_points": int(s.mp_valid.sum()),
            "n_frames_tracked": len(self.tracker.trajectory),
            "state": self.tracker.state,
        }

    def save_debug_image(self, path: str, image=None):
        """getDebugImg parity incl. the visual overlay (System.cc:214-261):
        draws the last keyframe's observed keypoints and the reprojections
        of its map points (the reference shows this via cv::imshow; headless
        environments get a PNG).  `image`: optional [H, W] grayscale
        backdrop (e.g. the KF's frame); without it the overlay is drawn on
        a blank canvas.  Returns the stats dict."""
        info, proj, obs_uv, ok = self.debug_info()
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(self.cfg.image_width / 100.0,
                                        self.cfg.image_height / 100.0))
        if image is not None:
            ax.imshow(np.asarray(image), cmap="gray", vmin=0, vmax=1)
        else:
            ax.set_xlim(0, self.cfg.image_width)
            ax.set_ylim(self.cfg.image_height, 0)
            ax.set_facecolor("black")
        if proj is not None:
            ax.scatter(obs_uv[ok, 0], obs_uv[ok, 1], s=6, c="lime",
                       marker="o", label="observed")
            ax.scatter(proj[ok, 0], proj[ok, 1], s=6, c="red", marker="x",
                       label="reprojected")
        ax.set_title("reproj err %.2f px, %d matches, %d KFs, %d MPs" % (
            info.get("mean_reproj_err", float("nan")), info.get("n_matches", 0),
            info["n_keyframes"], info["n_map_points"]))
        ax.legend(loc="lower right", fontsize=6)
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return info

    def save_result(self, out_dir: str, filenames=None):
        """Plain-text map dump (track/desc/kps/posi/traj.txt) —
        System::saveResult parity (System.cc:548-661)."""
        from asdslam_tpu.io import results
        results.save_result(self.store, out_dir, filenames)

    def debug_info(self):
        """Reprojection diagnostics of the last keyframe — getDebugImg
        parity (System.cc:214-261) minus the cv::imshow overlay: projects
        the KF's associated map points with its optimized pose and reports
        the mean pixel reprojection error plus match/map counts.  Returns
        (stats dict, projected uv [N, 2], observed uv [N, 2], mask [N])."""
        s = self.store
        kfs = [k for k in range(s.n_kf) if s.kf_valid[k]]
        info = dict(self.stats(), mean_reproj_err=float("nan"), n_matches=0)
        if not kfs:
            return info, None, None, None
        k = kfs[-1]
        h = s.kf_host[k]
        mp = s.kf_mp[k]
        has = (mp >= 0) & s.mp_valid[np.where(mp >= 0, mp, 0)]
        if not has.any():
            return info, None, None, None
        from asdslam_tpu.mapping.map_store import _pose_np
        R, t = _pose_np(s.kf_pose[k])
        X = s.mp_pos[np.where(has, mp, 0)]
        xc = X @ R.T + t
        z = np.where(np.abs(xc[:, 2]) < 1e-9, 1e-9, xc[:, 2])
        K = np.asarray(self.K)
        u = K[0, 0] * xc[:, 0] / z + K[0, 2]
        v = K[1, 1] * xc[:, 1] / z + K[1, 2]
        proj = np.stack([u, v], 1)
        err = np.linalg.norm(proj - h.uv_und, axis=1)
        ok = has & (xc[:, 2] > 0)
        info["n_matches"] = int(ok.sum())
        info["mean_reproj_err"] = float(err[ok].mean()) if ok.any() else float("nan")
        return info, proj, h.uv_und, ok


def _mat_to_quat_np(R):
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    if i == 0:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        return np.array([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                         (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    if i == 1:
        s = np.sqrt(1.0 - R[0, 0] + R[1, 1] - R[2, 2]) * 2
        return np.array([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                         0.25 * s, (R[1, 2] + R[2, 1]) / s])
    s = np.sqrt(1.0 - R[0, 0] - R[1, 1] + R[2, 2]) * 2
    return np.array([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                     (R[1, 2] + R[2, 1]) / s, 0.25 * s])
