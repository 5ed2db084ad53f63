"""Numerics parity of the fused Pallas matcher (ops/pallas_match.masked_nn)
against the jnp distance-matrix path (ops/match) — idx/best/valid equality
including masked rows, duplicate columns, tie cases, window/level gates and
skip_b.  Runs in interpret mode on the CPU mesh; the same kernel compiles for
TPU (exercised by micro_bench.py --pallas and cfg.use_pallas_match)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asdslam_tpu.ops import match, pallas_match


def _problem(key, n=300, m=257, d=128, tie_rows=8):
    ks = jax.random.split(key, 8)
    desc_a = jax.random.normal(ks[0], (n, d))
    desc_a = desc_a / jnp.linalg.norm(desc_a, axis=1, keepdims=True)
    desc_b = jax.random.normal(ks[1], (m, d))
    desc_b = desc_b / jnp.linalg.norm(desc_b, axis=1, keepdims=True)
    # genuine correspondences: half of B are noisy copies of A rows
    half = m // 2
    noisy = desc_a[:half] + 0.05 * jax.random.normal(ks[2], (half, d))
    desc_b = desc_b.at[:half].set(noisy / jnp.linalg.norm(noisy, axis=1, keepdims=True))
    # exact duplicate columns to force cross-tile ties
    desc_b = desc_b.at[100].set(desc_b[3])
    desc_b = desc_b.at[m - 1].set(desc_b[7])
    # rows equal to some b column (distance exactly 0, duplicated)
    desc_a = desc_a.at[:tie_rows].set(desc_b[3])
    uv_a = jax.random.uniform(ks[2], (n, 2), minval=0, maxval=600)
    uv_b = jax.random.uniform(ks[3], (m, 2), minval=0, maxval=600)
    # cluster positions so windows actually gate
    uv_b = uv_b.at[: m // 2].set(uv_a[: m // 2] +
                                 jax.random.normal(ks[4], (m // 2, 2)) * 20)
    valid_a = jax.random.uniform(ks[5], (n,)) > 0.1
    valid_b = jax.random.uniform(ks[6], (m,)) > 0.1
    lvl_a = jax.random.randint(ks[7], (n,), 0, 4)
    lvl_b = jax.random.randint(ks[0], (m,), 0, 4)
    lvl_b = lvl_b.at[: m // 2].set(lvl_a[: m // 2])  # corresponding halves agree
    radius = 60.0 + 40.0 * jax.random.uniform(ks[1], (n,))
    return desc_a, desc_b, uv_a, uv_b, valid_a, valid_b, lvl_a, lvl_b, radius


class TestPallasParity:
    @pytest.mark.parametrize("ratio", [1.0, 0.8])
    def test_search_projection_parity(self, ratio):
        (desc_a, desc_b, uv_a, uv_b, valid_a, valid_b,
         lvl_a, lvl_b, radius) = _problem(jax.random.PRNGKey(0))

        import functools
        orig = pallas_match.masked_nn
        pallas_match.masked_nn = functools.partial(orig, interpret=True)
        try:
            idx_p, d_p, ok_p = match.search_projection(
                desc_a, desc_b, uv_a, uv_b, valid_a, valid_b, radius, 1.2,
                ratio=ratio, pred_level_a=lvl_a, levels_b=lvl_b,
                use_pallas=True)
        finally:
            pallas_match.masked_nn = orig
        idx_j, d_j, ok_j = match.search_projection(
            desc_a, desc_b, uv_a, uv_b, valid_a, valid_b, radius, 1.2,
            ratio=ratio, pred_level_a=lvl_a, levels_b=lvl_b)

        ok_p, ok_j = np.asarray(ok_p), np.asarray(ok_j)
        idx_p, idx_j = np.asarray(idx_p), np.asarray(idx_j)
        np.testing.assert_array_equal(ok_p, ok_j)
        np.testing.assert_array_equal(idx_p[ok_p], idx_j[ok_j])
        np.testing.assert_allclose(np.asarray(d_p)[ok_p],
                                   np.asarray(d_j)[ok_j], atol=1e-5)
        assert ok_j.sum() > 20  # the scenario exercises real matches

    def test_skip_b_and_masked_rows(self):
        (desc_a, desc_b, uv_a, uv_b, valid_a, valid_b,
         lvl_a, lvl_b, radius) = _problem(jax.random.PRNGKey(1))
        skip_b = jax.random.uniform(jax.random.PRNGKey(2), (desc_b.shape[0],)) > 0.5
        valid_a = valid_a.at[:40].set(False)   # a block of masked rows

        import functools
        orig = pallas_match.masked_nn
        pallas_match.masked_nn = functools.partial(orig, interpret=True)
        try:
            idx_p, d_p, ok_p = match.search_projection(
                desc_a, desc_b, uv_a, uv_b, valid_a, valid_b, radius, 1.2,
                ratio=0.9, pred_level_a=lvl_a, levels_b=lvl_b,
                skip_b=skip_b, use_pallas=True)
        finally:
            pallas_match.masked_nn = orig
        idx_j, d_j, ok_j = match.search_projection(
            desc_a, desc_b, uv_a, uv_b, valid_a, valid_b, radius, 1.2,
            ratio=0.9, pred_level_a=lvl_a, levels_b=lvl_b, skip_b=skip_b)
        np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_j))
        op = np.asarray(ok_p)
        np.testing.assert_array_equal(np.asarray(idx_p)[op], np.asarray(idx_j)[op])
        assert not np.asarray(ok_p)[:40].any()

    def test_no_level_gate(self):
        (desc_a, desc_b, uv_a, uv_b, valid_a, valid_b,
         _, _, radius) = _problem(jax.random.PRNGKey(3))
        import functools
        orig = pallas_match.masked_nn
        pallas_match.masked_nn = functools.partial(orig, interpret=True)
        try:
            idx_p, d_p, ok_p = match.search_projection(
                desc_a, desc_b, uv_a, uv_b, valid_a, valid_b, radius, 1.2,
                ratio=1.0, use_pallas=True)
        finally:
            pallas_match.masked_nn = orig
        idx_j, d_j, ok_j = match.search_projection(
            desc_a, desc_b, uv_a, uv_b, valid_a, valid_b, radius, 1.2,
            ratio=1.0)
        np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_j))
        op = np.asarray(ok_p)
        np.testing.assert_array_equal(np.asarray(idx_p)[op], np.asarray(idx_j)[op])
