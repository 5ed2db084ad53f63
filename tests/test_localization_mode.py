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
