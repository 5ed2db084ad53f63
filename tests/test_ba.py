import jax
import jax.numpy as jnp
import numpy as np

from asdslam_tpu.backend import ba
from asdslam_tpu.geometry import se3

K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])


def project(pose7, X):
    R, t = se3.pose_unpack(pose7)
    xc = X @ R.T + t
    uvh = xc @ K.T
    return uvh[:, :2] / uvh[:, 2:3]


class TestPoseOnly:
    def make(self, key, n=200, noise=0.5, outliers=20):
        k1, k2, k3 = jax.random.split(key, 3)
        X = jax.random.uniform(k1, (n, 3), minval=-2.0, maxval=2.0) + jnp.array([0.0, 0.0, 6.0])
        xi_gt = jnp.array([0.03, -0.02, 0.01, 0.2, -0.1, 0.15])
        pose_gt = se3.pose_retract(se3.pose_identity(), xi_gt)
        uv = project(pose_gt, X) + noise * jax.random.normal(k2, (n, 2))
        if outliers:
            bad = jax.random.uniform(k3, (outliers, 2), minval=0, maxval=480)
            uv = uv.at[:outliers].set(bad)
        return X, uv, pose_gt

    def test_converges_from_identity(self):
        X, uv, pose_gt = self.make(jax.random.PRNGKey(0))
        n = X.shape[0]
        pose, inl, n_in = ba.pose_only_optimize(
            se3.pose_identity(), X, uv, jnp.ones(n), jnp.ones(n, bool), K)
        R, t = se3.pose_unpack(pose)
        Rg, tg = se3.pose_unpack(pose_gt)
        ang = np.degrees(np.arccos(np.clip((np.trace(np.asarray(R) @ np.asarray(Rg).T) - 1) / 2, -1, 1)))
        assert ang < 0.1
        assert float(jnp.linalg.norm(t - tg)) < 0.02
        assert int(n_in) > 160  # outliers rejected

    def test_outlier_mask(self):
        X, uv, pose_gt = self.make(jax.random.PRNGKey(1), outliers=30)
        n = X.shape[0]
        pose, inl, n_in = ba.pose_only_optimize(
            se3.pose_identity(), X, uv, jnp.ones(n), jnp.ones(n, bool), K)
        inl = np.asarray(inl)
        # injected outliers (first 30) must be flagged out
        assert inl[:30].sum() <= 2

    def test_respects_valid_mask(self):
        X, uv, pose_gt = self.make(jax.random.PRNGKey(2), outliers=0)
        n = X.shape[0]
        valid = jnp.arange(n) < 100
        pose, inl, n_in = ba.pose_only_optimize(
            se3.pose_identity(), X, uv, jnp.ones(n), valid, K)
        assert int(n_in) <= 100


class TestBundleAdjust:
    def make_problem(self, key, n_cams=6, n_pts=150, noise=0.3, perturb=0.05):
        ks = jax.random.split(key, 6)
        X_gt = jax.random.uniform(ks[0], (n_pts, 3), minval=-3.0, maxval=3.0) + jnp.array([0.0, 0.0, 8.0])
        poses_gt = []
        for c in range(n_cams):
            xi = jnp.array([0.0, 0.0, 0.0, 0.4 * c - 1.0, 0.0, 0.1 * c])
            poses_gt.append(se3.pose_retract(se3.pose_identity(), xi))
        poses_gt = jnp.stack(poses_gt)

        cam_idx = jnp.repeat(jnp.arange(n_cams, dtype=jnp.int32), n_pts)
        pt_idx = jnp.tile(jnp.arange(n_pts, dtype=jnp.int32), n_cams)
        uv = jnp.concatenate([project(poses_gt[c], X_gt) for c in range(n_cams)], axis=0)
        uv = uv + noise * jax.random.normal(ks[1], uv.shape)
        O = uv.shape[0]
        obs = ba.Obs(cam_idx=cam_idx, pt_idx=pt_idx, uv=uv,
                     inv_sigma2=jnp.ones(O), valid=jnp.ones(O, bool))

        # perturb initial guess (keep cam0, cam1 fixed at GT: gauge)
        poses0 = poses_gt
        for c in range(2, n_cams):
            xi = perturb * jax.random.normal(jax.random.fold_in(ks[2], c), (6,))
            poses0 = poses0.at[c].set(se3.pose_retract(poses_gt[c], xi))
        X0 = X_gt + perturb * jax.random.normal(ks[3], X_gt.shape)

        # optimized cams first: reorder so fixed ones go last
        order = list(range(2, n_cams)) + [0, 1]
        inv_order = np.argsort(order)
        poses0 = poses0[jnp.array(order)]
        poses_gt_r = poses_gt[jnp.array(order)]
        cam_remap = jnp.array(inv_order, jnp.int32)
        obs = obs._replace(cam_idx=cam_remap[obs.cam_idx])

        pt_obs = jnp.asarray(ba.build_pt_obs(obs.pt_idx, obs.valid, n_pts, n_cams + 2))
        prob = ba.BAProblem(poses7=poses0, points=X0, pt_valid=jnp.ones(n_pts, bool),
                            obs=obs, pt_obs=pt_obs)
        return prob, poses_gt_r, X_gt, n_cams - 2

    def test_reduces_error(self):
        prob, poses_gt, X_gt, n_opt = self.make_problem(jax.random.PRNGKey(3))
        poses, points, chi2 = ba.bundle_adjust(prob, K, n_opt=n_opt, iters=15)
        # camera error after vs before
        err_before = float(jnp.linalg.norm(prob.poses7[:n_opt, 4:] - poses_gt[:n_opt, 4:], axis=1).mean())
        err_after = float(jnp.linalg.norm(poses[:n_opt, 4:] - poses_gt[:n_opt, 4:], axis=1).mean())
        assert err_after < err_before * 0.2, (err_before, err_after)
        # fixed cameras untouched
        np.testing.assert_allclose(np.asarray(poses[n_opt:]), np.asarray(prob.poses7[n_opt:]), atol=1e-6)
        # points improved
        perr_before = float(jnp.linalg.norm(prob.points - X_gt, axis=1).mean())
        perr_after = float(jnp.linalg.norm(points - X_gt, axis=1).mean())
        assert perr_after < perr_before * 0.3

    def test_chi2_output(self):
        prob, poses_gt, X_gt, n_opt = self.make_problem(jax.random.PRNGKey(4), noise=0.1)
        poses, points, chi2 = ba.bundle_adjust(prob, K, n_opt=n_opt, iters=15)
        chi2 = np.asarray(chi2)
        assert np.isfinite(chi2[np.asarray(prob.obs.valid)]).all()
        assert np.median(chi2[np.asarray(prob.obs.valid)]) < 5.991
