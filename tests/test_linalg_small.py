"""Unit tests for the TPU-native small-matrix primitives
(estimators/linalg.inv3x3 / chol_solve_small) and the drift-analysis
diagnostics (utils/evaluate.drift_analysis)."""

import numpy as np
import jax
import jax.numpy as jnp

from asdslam_tpu.estimators import linalg
from asdslam_tpu.utils import evaluate


class TestInv3x3:
    def test_matches_numpy_inverse(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((64, 3, 3)).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(3)  # well-conditioned SPD
        inv = np.asarray(linalg.inv3x3(jnp.asarray(A)))
        np.testing.assert_allclose(inv, np.linalg.inv(A), rtol=2e-3, atol=2e-4)

    def test_general_nonsymmetric(self):
        rng = np.random.default_rng(1)
        A = rng.standard_normal((8, 3, 3)).astype(np.float32) + 2 * np.eye(3)
        inv = np.asarray(linalg.inv3x3(jnp.asarray(A)))
        eye = np.einsum("bij,bjk->bik", A, inv)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)),
                                   atol=5e-4)

    def test_singular_does_not_nan(self):
        A = jnp.zeros((2, 3, 3))
        inv = np.asarray(linalg.inv3x3(A))
        assert np.isfinite(inv).all()


class TestCholSolveSmall:
    def test_solves_spd_systems(self):
        rng = np.random.default_rng(2)
        for n in (3, 6, 7):
            B = rng.standard_normal((16, n, n)).astype(np.float32)
            A = B @ B.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)
            b = rng.standard_normal((16, n)).astype(np.float32)
            x = np.asarray(linalg.chol_solve_small(jnp.asarray(A),
                                                   jnp.asarray(b)))
            ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(16)])
            np.testing.assert_allclose(x, ref, rtol=5e-3, atol=5e-4)

    def test_unbatched(self):
        A = jnp.asarray([[4.0, 1.0], [1.0, 3.0]])
        b = jnp.asarray([1.0, 2.0])
        x = np.asarray(linalg.chol_solve_small(A, b))
        np.testing.assert_allclose(A @ x, b, atol=1e-6)


class TestDriftAnalysis:
    def _traj(self, n=400):
        t = np.linspace(0, 4 * np.pi, n)
        gt = np.stack([30 * np.cos(t), np.zeros_like(t), 30 * np.sin(t)], 1)
        return gt

    def test_perfect_trajectory_reports_no_drift(self):
        gt = self._traj()
        d = evaluate.drift_analysis(gt.copy(), gt)
        assert d["scale_drift_pct"] < 0.5
        assert all(s["local_rmse_m"] < 1e-3 for s in d["segments"])
        assert d["error_curve"][-1]["err_m"] < 1e-2

    def test_progressive_scale_drift_detected(self):
        gt = self._traj()
        # est shrinks 20% linearly over the run (classic monocular scale
        # drift): local windows must report scales deviating from 1
        factor = np.linspace(1.0, 0.8, len(gt))
        est = gt * factor[:, None]
        d = evaluate.drift_analysis(est, gt)
        assert d["scale_drift_pct"] > 3.0, d["scale_drift_pct"]
        # global error grows along the run
        errs = [c["err_m"] for c in d["error_curve"]]
        assert max(errs) > 1.0

    def test_local_noise_vs_drift_separation(self):
        gt = self._traj()
        est = gt + np.random.default_rng(0).normal(0, 0.05, gt.shape)
        d = evaluate.drift_analysis(est, gt)
        # pure noise: tiny local scale deviation, local rmse ~ noise level
        assert d["scale_drift_pct"] < 2.0
        med = np.median([s["local_rmse_m"] for s in d["segments"]])
        assert 0.01 < med < 0.15