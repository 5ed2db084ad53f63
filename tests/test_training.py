import numpy as np
import jax
import jax.numpy as jnp

from asdslam_tpu.models import asdnet, train
from asdslam_tpu.ops import orb


class TestLosses:
    def test_triplet_margin_zero_when_separated(self):
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (16, 8))
        a = a / jnp.linalg.norm(a, axis=1, keepdims=True)
        # positives identical to anchors, negatives (other rows) far
        loss = train.asd_loss(a, a, adaptive=False, margin=1.0)
        d = train.l2_distance_matrix_sqrt(a, a) + jnp.eye(16) * 10
        min_neg = float(jnp.min(d))
        expected = max(0.0, 1.0 + 0.0 - min_neg)
        assert abs(float(loss) - np.mean(np.maximum(
            1.0 - np.asarray(jnp.min(d + jnp.where(d < 0.008, 10.0, 0.0), axis=1)), 0))) < 0.3

    def test_adaptive_loss_finite(self):
        key = jax.random.PRNGKey(1)
        a = jax.random.normal(key, (32, 128))
        p = a + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (32, 128))
        a = a / jnp.linalg.norm(a, axis=1, keepdims=True)
        p = p / jnp.linalg.norm(p, axis=1, keepdims=True)
        loss = train.asd_loss(a, p, adaptive=True)
        assert np.isfinite(float(loss))

    def test_correlation_penalty_zero_for_decorrelated(self):
        # columns orthogonal after centering -> penalty ~ 0
        x = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])
        assert float(train.correlation_penalty(x)) < 1e-5

    def test_gor(self):
        a = jnp.eye(8, 128)
        n = jnp.roll(jnp.eye(8, 128), 1, axis=1)
        g = train.global_orthogonal_regularization(a, n)
        assert float(g) < 1e-6  # orthogonal anchors/negatives


class TestTraining:
    def test_few_steps_reduce_loss_and_improve_matching(self):
        key = jax.random.PRNGKey(3)
        params = asdnet.init_params(key)
        f0 = train.evaluate_fpr95(params, jax.random.PRNGKey(10))
        p2 = train.train_asdnet(jax.random.PRNGKey(4), n_steps=30, batch_size=128)
        f1 = train.evaluate_fpr95(p2, jax.random.PRNGKey(10))
        # training should not make verification dramatically worse; usually better
        assert f1 <= f0 + 0.05, (f0, f1)

    def test_fpr95_metric(self):
        pos = np.array([0.1, 0.2, 0.3, 0.2])
        neg = np.array([1.0, 1.1, 0.9, 1.2])
        assert train.fpr95(pos, neg) == 0.0
        assert train.fpr95(neg, pos) > 0.9


class TestOrb:
    def test_shape_and_norm(self):
        patches = jax.random.uniform(jax.random.PRNGKey(5), (8, 32, 32))
        d = orb.apply(patches)
        assert d.shape == (8, 256)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)

    def test_distance_maps_hamming(self):
        patches = jax.random.uniform(jax.random.PRNGKey(6), (2, 32, 32))
        d = orb.apply(patches)
        bits = orb.pack_bits(d)
        ham = np.unpackbits(bits[0] ^ bits[1]).sum()
        l2sq = float(np.sum((np.asarray(d[0]) - np.asarray(d[1])) ** 2))
        assert abs(l2sq - 4.0 * ham / 256.0) < 1e-4

    def test_brightness_invariance(self):
        p = jax.random.uniform(jax.random.PRNGKey(7), (4, 32, 32))
        d1 = orb.apply(p)
        d2 = orb.apply(p * 0.5 + 0.1)  # monotone intensity change
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


class TestAugmentation:
    def test_augment_preserves_pair_correspondence(self):
        """flip/rot90/crop (ASDNet.py:234-329 parity) applies the SAME
        geometric transform to both pair members: augmented anchors stay
        much closer to their positives than to shuffled ones."""
        import jax
        from asdslam_tpu.models.train import augment_pair

        key = jax.random.PRNGKey(0)
        base = jax.random.uniform(jax.random.PRNGKey(1), (32, 32, 32))
        noise = 0.05 * jax.random.normal(jax.random.PRNGKey(2), base.shape)
        a, p = augment_pair(key, base, base + noise)
        a, p = np.asarray(a), np.asarray(p)
        assert a.shape == (32, 32, 32)
        d_pair = np.abs(a - p).mean()
        d_rand = np.abs(a - np.roll(p, 1, axis=0)).mean()
        assert d_pair < 0.5 * d_rand, (d_pair, d_rand)
        # the transform actually changed the content for most samples
        changed = np.abs(a - np.asarray(base)).mean(axis=(1, 2))
        assert (changed > 1e-3).mean() > 0.5

    def test_gor_term_in_loss(self):
        """global orthogonal regularization is wired into train_step
        (silent parity gap in r2: defined but unused)."""
        import inspect
        from asdslam_tpu.models import train
        src = inspect.getsource(train.train_step)
        assert "global_orthogonal_regularization" in src
