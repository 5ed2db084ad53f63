import numpy as np
import jax
import jax.numpy as jnp

from asdslam_tpu.estimators import sim3_horn
from asdslam_tpu.geometry import sim3, se3
from asdslam_tpu.loop import vocab
from asdslam_tpu.backend import pose_graph

K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])


class TestHorn:
    def test_exact_alignment(self):
        key = jax.random.PRNGKey(0)
        P1 = jax.random.uniform(key, (50, 3), minval=-2, maxval=2) + jnp.array([0., 0., 5.])
        s_gt = 1.7
        R_gt = se3.so3_exp(jnp.array([0.2, -0.1, 0.3]))
        t_gt = jnp.array([0.5, -1.0, 2.0])
        P2 = s_gt * P1 @ R_gt.T + t_gt
        s, R, t = sim3_horn.horn_sim3(P1, P2)
        assert abs(float(s) - s_gt) < 1e-3
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-3)

    def test_ransac_with_outliers(self):
        key = jax.random.PRNGKey(1)
        N = 80
        P1 = jax.random.uniform(key, (N, 3), minval=-2, maxval=2) + jnp.array([0., 0., 6.])
        s_gt = 0.8
        R_gt = se3.so3_exp(jnp.array([0.05, 0.3, -0.1]))
        t_gt = jnp.array([1.0, 0.2, -0.5])
        P2 = s_gt * P1 @ R_gt.T + t_gt
        # corrupt 25%
        P2 = P2.at[:20].add(jax.random.normal(jax.random.PRNGKey(2), (20, 3)) * 3.0)

        def proj(P):
            z = P[:, 2:3]
            return jnp.concatenate([500.0 * P[:, 0:1] / z + 320.0,
                                    500.0 * P[:, 1:2] / z + 240.0], axis=1)

        uv1 = proj(P1)
        uv2 = proj(P2)
        th = jnp.full(N, 9.21 * 1.0)
        res = sim3_horn.ransac_sim3(
            jax.random.PRNGKey(3), P1, P2, uv1, uv2, jnp.ones(N, bool), K,
            th, th, iters=200, min_inliers=20)
        assert bool(res.success)
        assert abs(float(res.s) - s_gt) < 0.02
        inl = np.asarray(res.inliers)
        assert inl[20:].sum() >= 55 and inl[:20].sum() <= 3


class TestVocab:
    def test_train_transform_roundtrip(self):
        key = jax.random.PRNGKey(4)
        # clustered descriptors: 20 clusters
        centers = jax.random.normal(key, (20, 128))
        centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
        idx = jax.random.randint(jax.random.PRNGKey(5), (2000,), 0, 20)
        descs = centers[idx] + 0.05 * jax.random.normal(jax.random.PRNGKey(6), (2000, 128))
        # 25-word vocab over 20 clusters: same-cluster descriptors should
        # co-map (deeper vocabs intentionally over-quantize; that is fine for
        # retrieval but not a cluster-recovery test)
        v = vocab.train_vocab(jax.random.PRNGKey(7), descs, branching=5, depth=2)
        words = np.asarray(vocab.transform(v, descs))
        idx = np.asarray(idx)
        agree = 0
        for c in range(20):
            w = words[idx == c]
            if len(w):
                agree += (w == np.bincount(w).argmax()).mean()
        assert agree / 20 > 0.8

    def test_bow_scoring(self):
        key = jax.random.PRNGKey(8)
        descs = jax.random.normal(key, (3000, 128))
        v = vocab.train_vocab(jax.random.PRNGKey(9), descs, branching=4, depth=3)
        wa = vocab.transform(v, descs[:500])
        wb = vocab.transform(v, descs[:500])   # identical
        wc = vocab.transform(v, descs[1500:2000])
        va = vocab.bow_vector(v, wa)
        vb = vocab.bow_vector(v, wb)
        vc = vocab.bow_vector(v, wc)
        assert vocab.score_l1(va, vb) > 0.999
        assert vocab.score_l1(va, vc) < 0.8


class TestPoseGraph:
    def test_loop_correction(self):
        # chain of 10 poses with drift; loop edge ties last to first
        Kn = 10
        rng = np.random.default_rng(0)
        gt = [sim3.sim3_identity()]
        for i in range(1, Kn):
            xi = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])  # 1m steps
            gt.append(sim3.retract(gt[-1], xi))
        gt = jnp.stack(gt)

        # drifted estimates: noise in each step, accumulated
        drift = [np.asarray(gt[0])]
        for i in range(1, Kn):
            step = np.array([0., 0., 0.03, 1.0, 0.02, 0.0, 0.005])
            prev = jnp.asarray(drift[-1])
            drift.append(np.asarray(sim3.retract(
                prev, jnp.asarray(step + rng.normal(0, 0.005, 7)))))
        poses0 = jnp.asarray(np.stack(drift))

        # edges: odometry (from drifted relative = consistent, so use GT rel for
        # sequential and loop edge to pull it back)
        is_, js, meas, wts = [], [], [], []
        for i in range(Kn - 1):
            Si = sim3.sim3_unpack(gt[i])
            Sj = sim3.sim3_unpack(gt[i + 1])
            m = sim3.compose(*Sj, *sim3.inverse(*Si))  # S_ji = S_j S_i^-1
            # measurement stored as S_ji; edge_residual uses meas o S_i o S_j^-1
            is_.append(i + 1)  # note: e = log(meas o S_i o S_j^-1) with i<->j roles
            js.append(i)
            meas.append(np.asarray(sim3.sim3_pack(*m)))
            wts.append(1.0)
        # loop edge between 9 and 0
        S0 = sim3.sim3_unpack(gt[0])
        S9 = sim3.sim3_unpack(gt[9])
        m = sim3.compose(*S9, *sim3.inverse(*S0))
        is_.append(9); js.append(0)
        meas.append(np.asarray(sim3.sim3_pack(*m)))
        wts.append(5.0)

        edges = pose_graph.PoseGraphEdges(
            i=jnp.asarray(js, jnp.int32),      # e(i,j) = log(meas o S_i o S_j^-1)
            j=jnp.asarray(is_, jnp.int32),     # meas = S_ji: so i=lower, j=upper
            meas=jnp.asarray(np.stack(meas)),
            weight=jnp.asarray(wts),
            valid=jnp.ones(len(wts), bool))
        fixed = jnp.zeros(Kn, bool).at[0].set(True)
        opt = pose_graph.optimize_pose_graph(poses0, edges, fixed, iters=15)

        # positions should be close to GT after optimization
        def centers(poses):
            out = []
            for k in range(Kn):
                s, R, t = sim3.sim3_unpack(poses[k])
                out.append(np.asarray(-R.T @ t / s))
            return np.stack(out)

        err0 = np.linalg.norm(centers(poses0) - centers(gt), axis=1).mean()
        err1 = np.linalg.norm(centers(opt) - centers(gt), axis=1).mean()
        assert err1 < err0 * 0.2, (err0, err1)


class TestBidirectionalSim3Gate:
    """The guided support check must be BIDIRECTIONAL (ORBmatcher::
    SearchBySim3 via LoopClosing.cc:269-441): descriptor aliasing can
    produce strong one-way projection support against a geometrically wrong
    candidate; requiring both directions kills such false positives."""

    def _make_store(self):
        from asdslam_tpu.mapping.map_store import MapStore
        from asdslam_tpu.config import SlamConfig
        from asdslam_tpu.loop.loop_closing import LoopCloser

        cfg = SlamConfig(n_features=128, image_width=640, image_height=480,
                         fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                         local_ba_max_points=512)
        Km = jnp.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
        store = MapStore(max_kfs=8, max_pts=1024, n_feat=128, max_obs=8)
        lc = LoopCloser(cfg, Km, store, run_global_ba=False)
        return cfg, Km, store, lc

    class Feat:
        def __init__(self, uv, desc):
            n = len(uv)
            self.uv_und = np.asarray(uv, np.float32)
            self.uv = self.uv_und
            self.level = np.zeros(n, np.int32)
            self.angle = np.zeros(n, np.float32)
            self.score = np.ones(n, np.float32)
            self.desc = np.asarray(desc, np.float32)
            self.valid = np.ones(n, bool)

    def test_one_way_aliasing_is_rejected(self):
        cfg, Km, store, lc = self._make_store()
        rng = np.random.default_rng(0)
        N = 128
        # place A's world points in front of the origin camera
        X_a = np.column_stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                               rng.uniform(4, 9, N)]).astype(np.float32)
        uv_a = np.column_stack([500 * X_a[:, 0] / X_a[:, 2] + 320,
                                500 * X_a[:, 1] / X_a[:, 2] + 240])

        def descs(seed):
            d = np.random.default_rng(seed).normal(0, 1, (N, 128)).astype(np.float32)
            return d / np.linalg.norm(d, axis=1, keepdims=True)

        # one-way aliasing: B's map points look like A's features (forward
        # matches), but A's map points do NOT look like B's features
        desc_shared = descs(1)    # B's points AND A's features
        desc_a_pts = descs(2)     # A's map points (match nothing on B)
        desc_b_feat = descs(3)    # B's features (match nothing of A's points)

        pose_a = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        kf_a = store.add_keyframe(pose_a, 0, self.Feat(uv_a, desc_shared))
        for i in range(N):
            m = store.add_map_point(X_a[i], desc_a_pts[i], kf_a)
            store.add_observation(m, kf_a, i)
        store.update_normals_batch(np.arange(N), np.asarray(cfg.scale_factors))

        # B: camera FAR away (x += 500) seeing its own identical-layout
        # geometry — the classic repeated-structure false loop
        X_b = X_a + np.array([500.0, 0, 0], np.float32)
        pose_b = np.array([1, 0, 0, 0, -500.0, 0, 0], np.float32)  # t = -R c
        kf_b = store.add_keyframe(pose_b, 1, self.Feat(uv_a, desc_b_feat))
        ids_b = []
        for i in range(N):
            m = store.add_map_point(X_b[i], desc_shared[i], kf_b)
            store.add_observation(m, kf_b, i)
            ids_b.append(m)
        store.update_normals_batch(np.asarray(ids_b), np.asarray(cfg.scale_factors))

        # identity Sim3 between the two CAMERA frames (the aliasing scenario:
        # both cameras see identical pixel/descriptor patterns)
        from asdslam_tpu.mapping.map_store import _pose_np
        import asdslam_tpu.geometry.se3 as se3m

        Rn, tn, s = np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 1.0
        R2, t2 = _pose_np(store.kf_pose[kf_b])
        pose_fwd = np.concatenate([
            np.asarray(se3m.matrix_to_quat(jnp.asarray(Rn.T @ R2))),
            ((Rn.T @ (t2 - tn)) / s).astype(np.float32)])
        Rk, tk = _pose_np(store.kf_pose[kf_a])
        pose_bwd = np.concatenate([
            np.asarray(se3m.matrix_to_quat(jnp.asarray(Rn @ Rk))),
            (Rn @ tk + tn / s).astype(np.float32)])

        mps_b = store.local_map_points([kf_b])
        mps_a = store.local_map_points([kf_a])
        # forward: B's points projected into A through the fake Sim3 —
        # geometry built from B's own frame means these land on A's features
        n_fwd = lc._count_guided_matches(kf_a, pose_fwd, mps_b)
        # backward: A's points projected into B — world geometry disagrees
        n_bwd = lc._count_guided_matches(kf_b, pose_bwd, mps_a)
        assert n_fwd >= cfg.loop_min_total_matches, n_fwd
        assert n_bwd < cfg.loop_min_total_matches, n_bwd
        # the acceptance statistic is min(fwd, bwd): the false loop dies
        assert min(n_fwd, n_bwd) < cfg.loop_min_total_matches


class TestSim3Align:
    def test_optimize_sim3_align_recovers_transform(self):
        """OptimizeSim3Align parity (Optimizer.cc:1196): robust 3D-3D Sim3
        fit with 20% outliers."""
        key = jax.random.PRNGKey(3)
        N = 200
        X = jax.random.uniform(key, (N, 3), minval=-5, maxval=5)
        s_gt = 1.4
        R_gt = se3.so3_exp(jnp.array([0.1, -0.2, 0.3]))
        t_gt = jnp.array([2.0, -1.0, 0.5])
        Y = s_gt * X @ R_gt.T + t_gt
        Y = Y + 0.01 * jax.random.normal(jax.random.PRNGKey(4), Y.shape)
        Y = Y.at[:40].add(jax.random.normal(jax.random.PRNGKey(5), (40, 3)) * 5.0)
        s, R, t, inl = sim3_horn.optimize_sim3_align(X, Y, jnp.ones(N, bool))
        assert abs(float(s) - s_gt) < 0.01
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-2)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=5e-2)
        inl = np.asarray(inl)
        assert inl[40:].mean() > 0.95 and inl[:40].mean() < 0.2
