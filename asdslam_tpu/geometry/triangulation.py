"""Batched two-view DLT triangulation + quality checks.

Replaces the SVD triangulation inside LocalMapping::CreateNewMapPoints and
Initializer (src/vslam/src/LocalMapping.cc:~430-540, Initializer.cc
Triangulate).  The smallest-singular-vector solve is done as a batched 4x4
symmetric eigendecomposition of A^T A — eigh maps well to XLA on TPU and
avoids per-hypothesis SVD.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(P1, P2, x1, x2):
    """Triangulate normalized-coordinate correspondences.

    P1, P2: ``[..., 3, 4]`` projection matrices (typically [R|t] for
    normalized camera coords).
    x1, x2: ``[..., 2]`` normalized image coords in each view.
    Returns ``[..., 3]`` world points (homogeneous solution dehomogenized).
    """
    rows = [
        x1[..., 0:1] * P1[..., 2, :] - P1[..., 0, :],
        x1[..., 1:2] * P1[..., 2, :] - P1[..., 1, :],
        x2[..., 0:1] * P2[..., 2, :] - P2[..., 0, :],
        x2[..., 1:2] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(
        [rows[0], rows[1], rows[2], rows[3]], axis=-2
    )  # [..., 4, 4]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = vecs[..., :, 0]  # smallest
    w = X[..., 3:4]
    return X[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)


def reprojection_error2(R, t, X, xn):
    """Squared reprojection error in normalized coords for pose (R,t)."""
    xc = jnp.einsum("...ij,...j->...i", R, X) + t
    z = xc[..., 2]
    proj = xc[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-12, 1e-12, z[..., None])
    d = proj - xn
    return jnp.sum(d * d, axis=-1), z


def parallax_cos(c1, c2, X):
    """Cosine of the ray angle at X subtended by camera centres c1, c2."""
    r1 = X - c1
    r2 = X - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.clip(n1 * n2, 1e-12)
