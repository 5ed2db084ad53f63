import numpy as np
import jax
import jax.numpy as jnp

from asdslam_tpu.backend import ba, global_ba
from tests.test_ba import TestBundleAdjust, K


class TestGlobalBA:
    def test_matches_dense_schur(self):
        helper = TestBundleAdjust()
        prob, poses_gt, X_gt, n_opt = helper.make_problem(jax.random.PRNGKey(11))
        poses_d, pts_d, chi2_d = ba.bundle_adjust(prob, K, n_opt=n_opt, iters=15)
        poses_g, pts_g, chi2_g = global_ba.global_bundle_adjust(
            prob.poses7, prob.points, prob.pt_valid, prob.obs, K,
            n_opt=n_opt, iters=15, cg_iters=30)
        # both should reach the same optimum (translation parts)
        err_d = float(jnp.linalg.norm(poses_d[:n_opt, 4:] - poses_gt[:n_opt, 4:], axis=1).mean())
        err_g = float(jnp.linalg.norm(poses_g[:n_opt, 4:] - poses_gt[:n_opt, 4:], axis=1).mean())
        assert err_g < max(2 * err_d, 5e-3), (err_d, err_g)

    def test_larger_problem(self):
        helper = TestBundleAdjust()
        prob, poses_gt, X_gt, n_opt = helper.make_problem(
            jax.random.PRNGKey(12), n_cams=12, n_pts=400, perturb=0.08)
        err0 = float(jnp.linalg.norm(prob.poses7[:n_opt, 4:] - poses_gt[:n_opt, 4:], axis=1).mean())
        poses_g, pts_g, chi2 = global_ba.global_bundle_adjust(
            prob.poses7, prob.points, prob.pt_valid, prob.obs, K,
            n_opt=n_opt, iters=15, cg_iters=40)
        err1 = float(jnp.linalg.norm(poses_g[:n_opt, 4:] - poses_gt[:n_opt, 4:], axis=1).mean())
        assert err1 < err0 * 0.1, (err0, err1)
