"""Map save -> load -> localization-only tracking against the prior map
(System::TrackLocalization / Tracking::Loc parity — BASELINE config 4)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from asdslam_tpu.io import synthetic
from asdslam_tpu.models import patch_descriptor
from asdslam_tpu.system import System
from asdslam_tpu.utils import evaluate
from tests.test_e2e_synthetic import small_config


class TestLocalizationMode:
    def test_save_load_localize(self, tmp_path):
        cfg = small_config()
        K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
        scene = synthetic.Scene(back_z=-8.0, front_z=20.0)
        frames, poses = synthetic.render_sequence(
            K, n_frames=30, height=cfg.image_height, width=cfg.image_width,
            step=0.25, turn=0.004, scene=scene)

        # 1) build a map
        sys1 = System(cfg, descriptor_fn=patch_descriptor.apply)
        for i in range(30):
            sys1.track_monocular(frames[i], i)
        assert sys1.stats()["n_keyframes"] >= 2
        path = os.path.join(tmp_path, "chamo.map")
        sys1.save_map(path)

        # 2) fresh system in localization mode
        sys2 = System(cfg, descriptor_fn=patch_descriptor.apply, localization_mode=True)
        sys2.load_map(path)
        assert sys2.store.n_kf == sys1.stats()["n_keyframes"]

        tracked = 0
        for i in range(30):
            pose = sys2.track_monocular(frames[i], i)
            if pose is not None:
                tracked += 1
        # no map growth in localization mode
        assert sys2.store.n_kf == sys1.stats()["n_keyframes"]
        assert tracked >= 15, tracked

        # localized trajectory should agree with the mapping trajectory
        est1 = evaluate.camera_centers(sys1.frame_trajectory())
        est2 = evaluate.camera_centers(sys2.frame_trajectory())
        e1, e2 = evaluate.associate_by_id(est1, est2)
        err = np.linalg.norm(e1 - e2, axis=1)
        assert np.median(err) < 0.05, np.median(err)


class TestRelocAcceptance:
    """Relocalization acceptance parity (Tracking.cc:1190-1240): a candidate
    that can only ever produce < 50 inliers must be REJECTED — the reference
    widens the search and re-optimizes but never relaxes the 50-inlier bar.
    (A previous build accepted at min(reloc_min_inliers, 30).)"""

    def test_thin_map_reloc_rejected_rich_map_accepted(self, tmp_path):
        cfg = small_config()
        K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
        scene = synthetic.Scene(back_z=-8.0, front_z=20.0)
        frames, poses = synthetic.render_sequence(
            K, n_frames=30, height=cfg.image_height, width=cfg.image_width,
            step=0.25, turn=0.004, scene=scene)
        sys1 = System(cfg, descriptor_fn=patch_descriptor.apply)
        for i in range(30):
            sys1.track_monocular(frames[i], i)
        path = os.path.join(tmp_path, "chamo.map")
        sys1.save_map(path)

        sys2 = System(cfg, descriptor_fn=patch_descriptor.apply,
                      localization_mode=True)
        sys2.load_map(path)
        tr = sys2.tracker
        feat = tr.extract(frames[5])

        # rich map: relocalization succeeds AND satisfies the 50-inlier bar
        assert tr._relocalize(feat)
        assert tr.n_inliers >= cfg.reloc_min_inliers, tr.n_inliers

        # thin map: keep only 40 of one KF's points — matches exist (>30
        # possible) but 50 inliers are unreachable, so reloc must fail
        store = sys2.store
        kf_mp = store.kf_mp[0]
        keep = np.unique(kf_mp[kf_mp >= 0])
        keep = keep[store.mp_valid[keep]][:40]
        mask = np.zeros_like(store.mp_valid)
        mask[keep] = True
        store.mp_valid[:] = mask
        tr.n_inliers = 0
        assert not tr._relocalize(feat)


class TestLocExtendMap:
    """Localization-mode MAP EXTENSION with GlobalMapFlag provenance (the
    reference's Loc mode keeps tracking against a prior map and can insert
    new keyframes; prior-map entities carry GlobalMapFlag — KeyFrame.h:142-143
    — and KeyFrameDatabase filters candidates on it,
    KeyFrameDatabase.cc:146,229)."""

    def test_build_save_reload_extend_relocalize(self, tmp_path):
        cfg = small_config().replace(loc_extend_map=True)
        K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
        scene = synthetic.Scene(back_z=-8.0, front_z=24.0)
        frames, poses = synthetic.render_sequence(
            K, n_frames=40, height=cfg.image_height, width=cfg.image_width,
            step=0.25, turn=0.004, scene=scene)

        # 1) build a map from the FIRST half and save it
        sys1 = System(cfg, descriptor_fn=patch_descriptor.apply)
        for i in range(20):
            sys1.track_monocular(frames[i], i)
        n_kf_prior = sys1.stats()["n_keyframes"]
        assert n_kf_prior >= 2
        path = os.path.join(tmp_path, "chamo.map")
        sys1.save_map(path)

        # 2) reload in localization mode with extension enabled; track the
        # WHOLE sequence — the second half extends past the prior map
        sys2 = System(cfg, descriptor_fn=patch_descriptor.apply,
                      localization_mode=True)
        sys2.load_map(path)
        n_loaded = sys2.store.n_kf
        assert bool(sys2.store.kf_global[:n_loaded].all())  # provenance: prior
        for i in range(40):
            sys2.track_monocular(frames[i], i)
        sys2.finish()

        # map extension happened, and ONLY new entities lack the flag
        n_after = sys2.store.n_kf
        assert n_after > n_loaded, (n_after, n_loaded)
        assert bool(sys2.store.kf_global[:n_loaded].all())
        assert not sys2.store.kf_global[n_loaded:n_after].any()
        new_mp = sys2.store.mp_valid[:sys2.store.n_mp] & \
            ~sys2.store.mp_global[:sys2.store.n_mp]
        assert new_mp.sum() > 50  # extension created unflagged points

        # 3) provenance respected by relocalization: a third system loads
        # nothing but relocalizes against sys2's saved (extended) map; the
        # restrict mask in localization mode only admits prior-map KFs
        path2 = os.path.join(tmp_path, "extended.map")
        sys2.save_map(path2)
        sys3 = System(cfg, descriptor_fn=patch_descriptor.apply,
                      localization_mode=True)
        sys3.load_map(path2)
        tracked = 0
        for i in range(0, 20):
            if sys3.track_monocular(frames[i], i) is not None:
                tracked += 1
        assert tracked >= 10, tracked

        # extended trajectory quality: second half matches sys-building run
        est = evaluate.camera_centers(sys2.frame_trajectory())
        gt = evaluate.camera_centers(
            [(i, np.asarray(poses[i])) for i in range(40)])
        e, g = evaluate.associate_by_id(est, gt)
        assert len(e) >= 25
        ate = evaluate.ate_rmse(e, g, align="sim3")
        assert ate < 0.5, ate
