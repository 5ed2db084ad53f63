import jax
import jax.numpy as jnp
import numpy as np

from asdslam_tpu.ops import fast, pyramid, patches, match
from asdslam_tpu.models import asdnet


def synth_corner_image(h=96, w=128):
    """Image with bright squares: their corners are FAST corners."""
    img = jnp.zeros((h, w), jnp.float32) + 0.2
    for (cy, cx) in [(30, 40), (30, 90), (70, 40), (70, 90)]:
        img = img.at[cy - 6:cy + 6, cx - 6:cx + 6].set(0.9)
    return img


class TestFast:
    def test_detects_square_corners(self):
        img = synth_corner_image()
        xy, score, valid = fast.detect_level(
            img, threshold=0.1, min_threshold=0.05, max_keypoints=64, border=8
        )
        xy = np.asarray(xy)[np.asarray(valid)]
        assert len(xy) >= 8  # 4 squares x 4 corners at least partially found
        # every detection should be near a square corner
        corners = []
        for (cy, cx) in [(30, 40), (30, 90), (70, 40), (70, 90)]:
            for dy in (-6, 5):
                for dx in (-6, 5):
                    corners.append((cx + dx, cy + dy))
        corners = np.array(corners, float)
        for p in xy:
            d = np.min(np.linalg.norm(corners - p[None, :], axis=1))
            assert d <= 3.0, f"detection {p} far from any corner ({d})"

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 0.5)
        xy, score, valid = fast.detect_level(
            img, threshold=0.1, min_threshold=0.05, max_keypoints=32, border=8
        )
        assert not bool(jnp.any(valid))

    def test_score_positive_at_corner(self):
        img = synth_corner_image()
        s = fast.fast_score(img)
        assert float(s[24, 34]) >= 0.0  # near corner region, finite
        assert np.isfinite(np.asarray(s)).all()


class TestPyramid:
    def test_shapes(self):
        img = jnp.zeros((376, 1241))
        levels = pyramid.build_pyramid(img, 8, 1.2)
        assert len(levels) == 8
        assert levels[0].shape == (376, 1241)
        assert levels[1].shape == (313, 1034)

    def test_blur_preserves_mean(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (64, 64))
        out = pyramid.gaussian_blur(img)
        assert abs(float(img.mean()) - float(out.mean())) < 0.01


class TestPatches:
    def test_ic_angle_gradient(self):
        # horizontal ramp -> centroid to the right -> angle ~ 0
        img = jnp.tile(jnp.linspace(0, 1, 64)[None, :], (64, 1))
        xy = jnp.array([[32.0, 32.0]])
        ang = patches.ic_angle(img, xy, radius=15)
        assert abs(float(ang[0])) < 0.05
        # vertical ramp -> angle ~ pi/2
        ang2 = patches.ic_angle(img.T, xy, radius=15)
        assert abs(float(ang2[0]) - np.pi / 2) < 0.05

    def test_extract_patches_center(self):
        img = jnp.arange(64 * 64, dtype=jnp.float32).reshape(64, 64)
        xy = jnp.array([[20.0, 30.0]])
        p = patches.extract_patches(img, xy, size=32)
        assert p.shape == (1, 32, 32)
        # center pixel of patch == image at (y, x)
        assert float(p[0, 16, 16]) == float(img[30, 20])

    def test_rotated_patch_flip(self):
        img = jax.random.uniform(jax.random.PRNGKey(1), (64, 64))
        xy = jnp.array([[32.0, 32.0]])
        p0 = patches.extract_rotated_patches(img, xy, jnp.array([0.0]), size=16)
        ppi = patches.extract_rotated_patches(img, xy, jnp.array([np.pi]), size=16)
        # rotating the sampling grid by pi flips the patch in both axes
        np.testing.assert_allclose(
            np.asarray(ppi[0]), np.asarray(p0[0])[::-1, ::-1], atol=1e-4
        )

    def test_rotated_patch_ramp(self):
        # on a linear ramp f(x, y) = x, angle 0 patch columns equal x coords
        img = jnp.tile(jnp.arange(64, dtype=jnp.float32)[None, :], (64, 1))
        xy = jnp.array([[32.0, 32.0]])
        p = patches.extract_rotated_patches(img, xy, jnp.array([0.0]), size=16)
        expect = 32.0 + (jnp.arange(16, dtype=jnp.float32) - 7.5)
        np.testing.assert_allclose(np.asarray(p[0][0]), np.asarray(expect), atol=1e-4)


class TestMatch:
    def test_distance_matrix(self):
        a = jnp.eye(4, 8)
        b = jnp.eye(4, 8) * 2
        d = match.distance_matrix(a, b)
        np.testing.assert_allclose(np.diag(np.asarray(d)), 1.0, atol=1e-5)

    def test_global_match_identity(self):
        key = jax.random.PRNGKey(2)
        a = jax.random.normal(key, (32, 128))
        a = a / jnp.linalg.norm(a, axis=1, keepdims=True)
        perm = jax.random.permutation(jax.random.PRNGKey(3), 32)
        b = a[perm] + 0.01 * jax.random.normal(jax.random.PRNGKey(4), (32, 128))
        valid = jnp.ones(32, bool)
        idx, d, ok = match.search_global(a, b, valid, valid, max_dist=0.5, ratio=0.9)
        inv = np.argsort(np.asarray(perm))
        assert bool(jnp.all(ok))
        np.testing.assert_array_equal(np.asarray(idx), inv)

    def test_window_restricts(self):
        a = jnp.ones((2, 8))
        b = jnp.ones((2, 8))
        uv_a = jnp.array([[0.0, 0.0], [100.0, 100.0]])
        uv_b = jnp.array([[95.0, 100.0], [0.0, 3.0]])
        valid = jnp.ones(2, bool)
        idx, d, ok = match.search_window(
            a, b, uv_a, uv_b, valid, valid, radius=10.0, max_dist=1.0, ratio=1.0
        )
        assert np.asarray(idx).tolist() == [1, 0]
        assert bool(jnp.all(ok))

    def test_duplicate_resolution(self):
        # two rows matching same column: only closer row keeps it
        dist = jnp.array([[0.1, jnp.inf], [0.05, jnp.inf]])
        idx, d, ok = match.nn_match(dist, max_dist=1.0)
        ok = match.resolve_duplicates(idx, d, ok, 2)
        assert np.asarray(ok).tolist() == [False, True]

    def test_rotation_consistency(self):
        n = 40
        idx = jnp.arange(n, dtype=jnp.int32)
        valid = jnp.ones(n, bool)
        ang_a = jnp.zeros(n)
        # most matches rotated 0.5 rad, a few outliers at 2.5 rad
        ang_b = jnp.full((n,), -0.5).at[:4].set(-2.5)
        ok = match.rotation_consistency(ang_a, ang_b, idx, valid, keep_bins=1)
        assert int(ok.sum()) == n - 4
        assert not bool(ok[0])


class TestAsdnet:
    def test_output_shape_and_norm(self):
        params = asdnet.init_params(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32))
        d = asdnet.apply(params, x)
        assert d.shape == (16, 128)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-4)

    def test_brightness_invariance(self):
        # per-patch whitening makes output invariant to affine intensity change
        params = asdnet.init_params(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32))
        d1 = asdnet.apply(params, x)
        d2 = asdnet.apply(params, x * 0.5 + 0.2)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-2)

    def test_train_mode_stats(self):
        params = asdnet.init_params(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32))
        d, stats = asdnet.apply(params, x, train=True,
                                dropout_key=jax.random.PRNGKey(4), batch_stats=True)
        assert d.shape == (8, 128)
        assert len(stats[0]) == len(asdnet.LAYERS)
        p2 = asdnet.update_running_stats(params, stats)
        assert not np.allclose(np.asarray(p2["bn_mean"][0]), 0.0)
