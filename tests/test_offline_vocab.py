"""Offline vocabulary workflow: train from a saved map in run A, relocalize
in run B under the LOADED vocabulary (reference: small_voc.yml.gz trained
offline, consumed via --voc_addr; TemplatedVocabulary.h:1347-1455)."""

import os

import numpy as np
import jax.numpy as jnp

from asdslam_tpu.io import synthetic
from asdslam_tpu.models import patch_descriptor
from asdslam_tpu.system import System
from asdslam_tpu.utils import evaluate
from tests.test_e2e_synthetic import small_config


class TestOfflineVocab:
    def test_train_save_localize_with_saved_vocab(self, tmp_path):
        cfg = small_config()
        K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
        scene = synthetic.Scene(back_z=-8.0, front_z=20.0)
        frames, poses = synthetic.render_sequence(
            K, n_frames=30, height=cfg.image_height, width=cfg.image_width,
            step=0.25, turn=0.004, scene=scene)

        # run A: build + save the map
        sys1 = System(cfg, descriptor_fn=patch_descriptor.apply)
        for i in range(30):
            sys1.track_monocular(frames[i], i)
        map_path = os.path.join(tmp_path, "chamo.map")
        sys1.save_map(map_path)

        # offline tool: train a vocabulary from the saved map's descriptors
        import train_vocab as tool
        import jax
        from asdslam_tpu.loop import vocab as vocab_mod

        D = tool.collect_descriptors_from_map(map_path)
        D = D[np.linalg.norm(D, axis=1) > 1e-6]
        assert len(D) > 1000, len(D)
        voc = vocab_mod.train_vocab(jax.random.PRNGKey(11), jnp.asarray(D),
                                    branching=6, depth=3)
        voc_path = os.path.join(tmp_path, "voc.npz")
        vocab_mod.save_vocab(voc, voc_path)

        # run B: localization mode with the SAVED vocabulary (no online
        # training — the db must be indexed under the loaded vocab)
        sys2 = System(cfg, descriptor_fn=patch_descriptor.apply,
                      localization_mode=True)
        sys2.loop_closer.vocab = vocab_mod.load_vocab(voc_path)
        n_words_loaded = sys2.loop_closer.vocab.n_words
        sys2.load_map(map_path)
        assert sys2.loop_closer.vocab.n_words == n_words_loaded  # not retrained
        assert sys2.loop_closer.db is not None
        assert sys2.loop_closer.db.present[:sys2.store.n_kf].all()

        tracked = 0
        for i in range(30):
            pose = sys2.track_monocular(frames[i], i)
            if pose is not None:
                tracked += 1
        assert tracked >= 15, tracked

        est1 = evaluate.camera_centers(sys1.frame_trajectory())
        est2 = evaluate.camera_centers(sys2.frame_trajectory())
        e1, e2 = evaluate.associate_by_id(est1, est2)
        err = np.linalg.norm(e1 - e2, axis=1)
        assert np.median(err) < 0.05, np.median(err)
