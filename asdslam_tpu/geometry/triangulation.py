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


def triangulate_midpoint(R1, t1, R2, t2, x1, x2):
    """Midpoint triangulation of normalized-coordinate correspondences.

    Poses are world->camera.  Solves the 2x2 least-squares for the depths
    along each ray and returns the segment midpoint.  Unlike the DLT/eigh
    path this needs no eigendecomposition (TPU f32 eigh is slow to compile
    and imprecise); combined with `refine_point_gn` it is the hot-path
    triangulator.

    x1, x2: [..., 2] normalized coords.  Returns [..., 3] world points.
    """
    d1 = jnp.einsum("...ji,...j->...i", R1, jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1))
    d2 = jnp.einsum("...ji,...j->...i", R2, jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1))
    c1 = -jnp.einsum("...ji,...j->...i", R1, t1)
    c2 = -jnp.einsum("...ji,...j->...i", R2, t2)
    # normal equations for min ||(c1 + l1 d1) - (c2 + l2 d2)||:
    #   l1 (d1.d1) - l2 (d1.d2) = d1.(c2-c1)
    #   l1 (d1.d2) - l2 (d2.d2) = d2.(c2-c1)
    b = c2 - c1
    p = jnp.sum(d1 * d1, axis=-1)
    q = jnp.sum(d1 * d2, axis=-1)
    r = jnp.sum(d2 * d2, axis=-1)
    b1 = jnp.sum(d1 * b, axis=-1)
    b2 = jnp.sum(d2 * b, axis=-1)
    det = q * q - p * r  # <= 0; zero only for parallel rays
    det = jnp.where(jnp.abs(det) < 1e-12, -1e-12, det)
    l1 = (q * b2 - r * b1) / det
    l2 = (p * b2 - q * b1) / det
    p1 = c1 + l1[..., None] * d1
    p2 = c2 + l2[..., None] * d2
    return 0.5 * (p1 + p2)


def refine_point_gn(Rs, ts, xns, X0, valid=None, iters: int = 3):
    """Gauss-Newton refinement of a 3D point against multiple views.

    Rs, ts: [..., V, 3, 3], [..., V, 3] world->camera poses.
    xns:    [..., V, 2] normalized observations.
    X0:     [..., 3] initial point.  valid: [..., V] observation mask.
    """
    import jax

    def body(_, X):
        xc = jnp.einsum("...vij,...j->...vi", Rs, X) + ts
        z = jnp.clip(xc[..., 2], 1e-6)
        proj = xc[..., :2] / z[..., None]
        r = proj - xns  # [..., V, 2]
        # d proj / d X = [1/z, 0, -x/z^2; 0, 1/z, -y/z^2] @ R
        zi = 1.0 / z
        J_proj = jnp.stack(
            [
                jnp.stack([zi, jnp.zeros_like(zi), -xc[..., 0] * zi * zi], axis=-1),
                jnp.stack([jnp.zeros_like(zi), zi, -xc[..., 1] * zi * zi], axis=-1),
            ],
            axis=-2,
        )  # [..., V, 2, 3]
        J = J_proj @ Rs  # [..., V, 2, 3]
        if valid is not None:
            w = valid[..., None, None].astype(X.dtype)
            J = J * w
            r = r * valid[..., None].astype(X.dtype)
        H = jnp.einsum("...vki,...vkj->...ij", J, J)
        g = jnp.einsum("...vki,...vk->...i", J, r)
        H = H + 1e-8 * jnp.eye(3, dtype=X.dtype)
        dX = jnp.linalg.solve(H, g[..., None])[..., 0]
        return X - dX

    return jax.lax.fori_loop(0, iters, body, X0)


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
