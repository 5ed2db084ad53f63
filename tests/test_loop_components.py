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
