import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asdslam_tpu.geometry import se3, sim3, camera, triangulation


def random_rotations(key, n):
    q = jax.random.normal(key, (n, 4))
    return se3.quat_to_matrix(se3.quat_normalize(q))


class TestSE3:
    def test_quat_matrix_roundtrip(self):
        key = jax.random.PRNGKey(0)
        R = random_rotations(key, 64)
        q = se3.matrix_to_quat(R)
        R2 = se3.quat_to_matrix(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_quat_rotate_matches_matrix(self):
        key = jax.random.PRNGKey(1)
        R = random_rotations(key, 16)
        q = se3.matrix_to_quat(R)
        v = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
        np.testing.assert_allclose(
            se3.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-5
        )

    def test_so3_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(3)
        w = jax.random.normal(key, (128, 3))
        # keep |w| < pi for unique log
        w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * jax.random.uniform(
            jax.random.PRNGKey(4), (128, 1), minval=1e-6, maxval=3.0
        )
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        np.testing.assert_allclose(w, w2, atol=2e-4)

    def test_so3_small_angle(self):
        w = jnp.array([[1e-9, -2e-9, 3e-9], [0.0, 0.0, 0.0]])
        R = se3.so3_exp(w)
        np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(se3.so3_log(R))))

    def test_se3_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (64, 6))
        xi = xi.at[:, :3].multiply(0.6)
        R, t = se3.se3_exp(xi)
        xi2 = se3.se3_log(R, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(6)
        xi = jax.random.normal(key, (8, 6)) * 0.5
        R, t = se3.se3_exp(xi)
        Ri, ti = se3.inverse(R, t)
        Rc, tc = se3.compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(tc, jnp.zeros((8, 3)), atol=1e-5)

    def test_pose_pack_retract(self):
        p = se3.pose_identity((4,))
        xi = jnp.zeros((4, 6)).at[:, 5].set(1.0)  # translate z
        p2 = se3.pose_retract(p, xi)
        R, t = se3.pose_unpack(p2)
        np.testing.assert_allclose(t, jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1)), atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(7)
        xi = jax.random.normal(key, (64, 7)) * 0.5
        s, R, t = sim3.sim3_exp(xi)
        xi2 = sim3.sim3_log(s, R, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(8)
        xi = jax.random.normal(key, (8, 7)) * 0.4
        s, R, t = sim3.sim3_exp(xi)
        si, Ri, ti = sim3.inverse(s, R, t)
        sc, Rc, tc = sim3.compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(sc, jnp.ones(8), atol=1e-5)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(tc, jnp.zeros((8, 3)), atol=1e-5)

    def test_transform_scale(self):
        s = jnp.array([2.0])
        R = jnp.eye(3)[None]
        t = jnp.array([[1.0, 0.0, 0.0]])
        x = jnp.array([[1.0, 1.0, 1.0]])
        y = sim3.transform(s, R, t, x)
        np.testing.assert_allclose(y, jnp.array([[3.0, 2.0, 2.0]]), atol=1e-6)


class TestCamera:
    def cam(self):
        return camera.Camera.create(458.654, 457.296, 367.215, 248.375,
                                    -0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)

    def test_distort_undistort_roundtrip(self):
        cam = self.cam()
        key = jax.random.PRNGKey(9)
        xn = jax.random.uniform(key, (256, 2), minval=-0.5, maxval=0.5)
        xd = camera.distort_normalized(cam, xn)
        xu = camera.undistort_normalized(cam, xd, iters=20)
        np.testing.assert_allclose(xn, xu, atol=1e-5)

    def test_project_backproject(self):
        cam = camera.Camera.create(700.0, 700.0, 600.0, 180.0)
        uv = jnp.array([[100.0, 50.0], [600.0, 180.0]])
        X = camera.backproject(cam, uv, jnp.array([2.0, 5.0]))
        uv2 = camera.project(cam, X)
        np.testing.assert_allclose(uv, uv2, atol=1e-4)

    def test_undistort_image_identity(self):
        cam = camera.Camera.create(100.0, 100.0, 32.0, 24.0)  # zero distortion
        img = jax.random.uniform(jax.random.PRNGKey(10), (48, 64))
        out = camera.undistort_image(cam, img)
        np.testing.assert_allclose(img, out, atol=1e-5)


class TestTriangulation:
    def test_two_view(self):
        key = jax.random.PRNGKey(11)
        X = jax.random.uniform(key, (128, 3), minval=-1.0, maxval=1.0) + jnp.array([0.0, 0.0, 5.0])
        R1, t1 = jnp.eye(3), jnp.zeros(3)
        xi = jnp.array([0.02, -0.03, 0.01, 0.5, 0.0, 0.05])
        R2, t2 = se3.se3_exp(xi)
        x1 = (X / X[:, 2:3])[:, :2]
        Xc2 = X @ R2.T + t2
        x2 = (Xc2 / Xc2[:, 2:3])[:, :2]
        P1 = jnp.concatenate([R1, t1[:, None]], axis=1)
        P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
        Xhat = triangulation.triangulate_dlt(
            jnp.broadcast_to(P1, (128, 3, 4)), jnp.broadcast_to(P2, (128, 3, 4)), x1, x2
        )
        np.testing.assert_allclose(X, Xhat, atol=1e-3)

    def test_parallax(self):
        c1 = jnp.zeros(3)
        c2 = jnp.array([1.0, 0.0, 0.0])
        X = jnp.array([[0.5, 0.0, 10.0]])
        cosp = triangulation.parallax_cos(c1, c2, X)
        assert float(cosp[0]) > 0.99
