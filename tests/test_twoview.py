import jax
import jax.numpy as jnp
import numpy as np

from asdslam_tpu.estimators import linalg, twoview
from asdslam_tpu.geometry import se3


class TestLinalg:
    def test_null_vector(self):
        key = jax.random.PRNGKey(0)
        # build A with known null vector
        v = jax.random.normal(key, (16, 9))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        B = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 9))
        # project B rows orthogonal to v -> null vector of A is v
        A = B - jnp.einsum("sij,sj->si", B, v)[..., None] * v[:, None, :]
        x = linalg.null_vector(A)
        dots = jnp.abs(jnp.einsum("si,si->s", x, v))
        np.testing.assert_allclose(np.asarray(dots), 1.0, atol=1e-3)

    def test_svd3_reconstruction(self):
        key = jax.random.PRNGKey(2)
        A = jax.random.normal(key, (8, 3, 3))
        U, s, Vt = linalg.svd3(A)
        rec = jnp.einsum("nij,nj,njk->nik", U, s, Vt)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(A), atol=2e-2)
        # orthonormality
        eye = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
        np.testing.assert_allclose(np.asarray(U @ jnp.swapaxes(U, -1, -2)), eye, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Vt @ jnp.swapaxes(Vt, -1, -2)), eye, atol=1e-3)
        # descending singular values
        s = np.asarray(s)
        assert (s[:, 0] >= s[:, 1] - 1e-4).all() and (s[:, 1] >= s[:, 2] - 1e-4).all()


def make_scene(key, n=300, planar=False, noise=0.5, outlier_frac=0.1):
    K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if planar:
        xy = jax.random.uniform(k1, (n, 2), minval=-2.0, maxval=2.0)
        X = jnp.concatenate([xy, jnp.full((n, 1), 6.0)], axis=1)
    else:
        X = jax.random.uniform(k1, (n, 3), minval=-2.0, maxval=2.0) + jnp.array([0.0, 0.0, 6.0])
    xi = jnp.array([0.02, -0.05, 0.01, 0.6, 0.05, 0.1])
    R2, t2 = se3.se3_exp(xi)

    def proj(Xc):
        uvh = Xc @ K.T
        return uvh[:, :2] / uvh[:, 2:3]

    uv1 = proj(X)
    uv2 = proj(X @ R2.T + t2)
    uv1 = uv1 + noise * jax.random.normal(k2, uv1.shape)
    uv2 = uv2 + noise * jax.random.normal(k3, uv2.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        bad = jax.random.uniform(k4, (n_out, 2), minval=0, maxval=480)
        uv2 = uv2.at[:n_out].set(bad)
    valid = jnp.ones(n, bool)
    return K, uv1, uv2, valid, R2, t2, X


def angle_between(R_est, R_gt):
    cosang = (np.trace(np.asarray(R_est) @ np.asarray(R_gt).T) - 1) / 2
    return np.degrees(np.arccos(np.clip(cosang, -1, 1)))


def direction_error(t_est, t_gt):
    t_est = np.asarray(t_est) / np.linalg.norm(t_est)
    t_gt = np.asarray(t_gt) / np.linalg.norm(t_gt)
    return np.degrees(np.arccos(np.clip(abs(t_est @ t_gt), -1, 1)))


class TestTwoView:
    def test_general_scene_fundamental(self):
        key = jax.random.PRNGKey(3)
        K, uv1, uv2, valid, R_gt, t_gt, X = make_scene(key, planar=False)
        res = twoview.initialize_two_view(jax.random.PRNGKey(4), uv1, uv2, valid, K)
        assert bool(res.success)
        assert not bool(res.used_homography)
        assert angle_between(res.R, R_gt) < 1.0
        assert direction_error(res.t, t_gt) < 2.0
        assert int(res.good.sum()) > 200

    def test_planar_scene_homography(self):
        key = jax.random.PRNGKey(5)
        K, uv1, uv2, valid, R_gt, t_gt, X = make_scene(key, planar=True, outlier_frac=0.05)
        res = twoview.initialize_two_view(jax.random.PRNGKey(6), uv1, uv2, valid, K)
        assert bool(res.used_homography)
        assert bool(res.success)
        assert angle_between(res.R, R_gt) < 1.5
        assert direction_error(res.t, t_gt) < 3.0

    def test_no_translation_fails(self):
        # pure rotation: parallax check must reject
        K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])
        key = jax.random.PRNGKey(7)
        X = jax.random.uniform(key, (300, 3), minval=-2.0, maxval=2.0) + jnp.array([0.0, 0.0, 6.0])
        R2 = se3.so3_exp(jnp.array([0.02, -0.03, 0.01]))

        def proj(Xc):
            uvh = Xc @ K.T
            return uvh[:, :2] / uvh[:, 2:3]

        uv1 = proj(X)
        uv2 = proj(X @ R2.T)
        valid = jnp.ones(300, bool)
        res = twoview.initialize_two_view(jax.random.PRNGKey(8), uv1, uv2, valid, K)
        assert not bool(res.success)

    def test_scale_consistency(self):
        # reconstructed points should match GT up to the |t|=1 scale
        key = jax.random.PRNGKey(9)
        K, uv1, uv2, valid, R_gt, t_gt, X = make_scene(key, noise=0.1, outlier_frac=0.0)
        res = twoview.initialize_two_view(jax.random.PRNGKey(10), uv1, uv2, valid, K)
        assert bool(res.success)
        scale = float(jnp.linalg.norm(t_gt))
        good = np.asarray(res.good)
        err = np.linalg.norm(np.asarray(res.points)[good] * scale - np.asarray(X)[good], axis=1)
        assert np.median(err) < 0.1
