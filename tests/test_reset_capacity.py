"""Reset parity + capacity hygiene.

Reference: Tracking::Reset clears map, KF database and ids on bad
initialization (src/vslam/src/Tracking.cc:1268-1305).  The TPU store adds
capacity growth: KITTI 00 tracks ~4,500 frames / ~1,200 keyframes, so fixed
capacities must grow transparently instead of raising.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.io import synthetic
from asdslam_tpu.mapping.map_store import MapStore
from asdslam_tpu.models import patch_descriptor
from asdslam_tpu.system import System


class FakeFeat:
    def __init__(self, n, d=8):
        self.uv_und = np.random.rand(n, 2).astype(np.float32) * 100
        self.level = np.zeros(n, np.int32)
        self.desc = np.random.rand(n, d).astype(np.float32)
        self.valid = np.ones(n, bool)


def _pose():
    p = np.zeros(7, np.float32)
    p[0] = 1.0
    return p


class TestCapacityGrowth:
    def test_keyframe_growth(self):
        store = MapStore(max_kfs=2, max_pts=8, n_feat=4, max_obs=4)
        for i in range(5):
            k = store.add_keyframe(_pose(), i, FakeFeat(4))
            assert k == i
        assert store.max_kfs >= 5
        assert store.n_kf == 5
        assert store.kf_valid[:5].all()
        assert (store.kf_frame_id[:5] == np.arange(5)).all()
        # new slots are clean
        assert not store.kf_valid[5:].any()
        assert (store.kf_mp[4] == -1).all()

    def test_map_point_growth(self):
        store = MapStore(max_kfs=4, max_pts=3, n_feat=4, max_obs=4)
        k = store.add_keyframe(_pose(), 0, FakeFeat(4))
        desc = np.random.rand(128).astype(np.float32)
        for i in range(10):
            m = store.add_map_point([0.0, 0.0, float(i)], desc, k)
            assert m == i
        assert store.max_pts >= 10
        assert store.mp_valid[:10].all()
        assert store.mp_pos[7, 2] == 7.0
        assert not store.mp_valid[10:].any()

    def test_growth_preserves_observations(self):
        store = MapStore(max_kfs=2, max_pts=2, n_feat=4, max_obs=4)
        k0 = store.add_keyframe(_pose(), 0, FakeFeat(4))
        m0 = store.add_map_point([1.0, 2.0, 3.0], np.zeros(128), k0)
        store.add_observation(m0, k0, 1)
        for i in range(4):
            store.add_map_point([0.0, 0.0, 1.0], np.zeros(128), k0)
            store.add_keyframe(_pose(), i + 1, FakeFeat(4))
        assert store.kf_mp[k0, 1] == m0
        assert store.mp_obs_kf[m0, 0] == k0
        assert store.mp_n_obs[m0] == 1


class TestClearAndReset:
    def test_store_clear(self):
        store = MapStore(max_kfs=4, max_pts=8, n_feat=4, max_obs=4)
        k = store.add_keyframe(_pose(), 0, FakeFeat(4))
        m = store.add_map_point([0.0, 0.0, 1.0], np.zeros(128), k)
        store.add_observation(m, k, 0)
        store.clear()
        assert store.n_kf == 0 and store.n_mp == 0
        assert not store.kf_valid.any() and not store.mp_valid.any()
        assert len(store.kf_features) == 0 and len(store.kf_host) == 0
        assert (store.kf_mp == -1).all()

    def test_failed_init_reinitializes_clean(self):
        """Drive a System to a successful init, force a reset (as a bad init
        would), and verify the map is empty and a SECOND init succeeds on a
        clean store."""
        cfg = SlamConfig(
            n_features=400, n_levels=4,
            image_width=320, image_height=240,
            fx=260.0, fy=260.0, cx=160.0, cy=120.0,
            local_ba_max_points=2048, local_ba_max_obs=8192,
            max_keyframes=32, max_map_points=8192)
        K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
        frames, poses = synthetic.render_sequence(
            K, n_frames=8, height=cfg.image_height, width=cfg.image_width,
            step=0.25)
        sys = System(cfg, descriptor_fn=patch_descriptor.apply,
                     do_loop_closing=True)
        for i in range(4):
            sys.track_monocular(frames[i], i)
        assert sys.stats()["n_keyframes"] >= 2

        sys.tracker._reset()
        s = sys.stats()
        assert s["n_keyframes"] == 0 and s["n_map_points"] == 0
        assert sys.loop_closer.db is None
        assert sys.loop_closer.kf_bow == {}
        assert sys.local_mapper.recent == []

        # re-run: must initialize again from scratch
        for i in range(4, 8):
            sys.track_monocular(frames[i], i)
        s = sys.stats()
        assert s["n_keyframes"] >= 2, s
        assert s["n_map_points"] > 50, s


class TestObsGrowth:
    def test_observation_capacity_grows(self):
        store = MapStore(max_kfs=64, max_pts=8, n_feat=4, max_obs=2)
        m = store.add_map_point([0.0, 0.0, 1.0], np.zeros(128), 0)
        for k in range(6):
            store.add_keyframe(_pose(), k, FakeFeat(4))
            store.add_observation(m, k, 0)
        assert store.mp_n_obs[m] == 6
        assert store.max_obs >= 6
        assert (store.mp_obs_kf[m, :6] == np.arange(6)).all()

    def test_replace_grows_obs(self):
        store = MapStore(max_kfs=64, max_pts=8, n_feat=4, max_obs=2)
        a = store.add_map_point([0.0, 0.0, 1.0], np.zeros(128), 0)
        b = store.add_map_point([0.0, 0.0, 1.1], np.zeros(128), 0)
        for k in range(4):
            store.add_keyframe(_pose(), k, FakeFeat(4))
        store.add_observation(a, 0, 0)
        store.add_observation(a, 1, 0)
        store.add_observation(b, 2, 0)
        store.add_observation(b, 3, 0)
        store.replace_map_point(b, a)   # a gains b's observations -> grow
        assert store.mp_n_obs[a] == 4
        assert not store.mp_valid[b]
        assert store.kf_mp[2, 0] == a and store.kf_mp[3, 0] == a
