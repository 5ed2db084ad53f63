"""PnP relocalization: batched-hypothesis RANSAC + DLT pose solve.

Fills the role of src/vslam/src/PnPsolver.cc (EPnP + RANSAC, params p=0.99 /
minInliers=10 / 300 iters / th2=5.991 from Tracking.cc:1141).  Instead of
EPnP's control-point formulation the minimal solve is a 6-point DLT of the
projection matrix (12-dim inverse-power null vector, batched over all
hypotheses at once — no early-exit loop), with the rotation re-orthogonalized
via svd3.  Accuracy is recovered by the inlier refit + the caller's
pose_only_optimize polish, matching the reference's
PnPsolver -> PoseOptimization pipeline.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from asdslam_tpu.estimators import linalg


class PnPResult(NamedTuple):
    success: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _dlt_rows(X, xn):
    """DLT rows for P [3, 4]: X [S, M, 3] world, xn [S, M, 2] normalized."""
    S, M, _ = X.shape
    ones = jnp.ones((S, M, 1), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=-1)  # [S, M, 4]
    z = jnp.zeros_like(Xh)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    r1 = jnp.concatenate([Xh, z, -u * Xh], axis=-1)   # [S, M, 12]
    r2 = jnp.concatenate([z, Xh, -v * Xh], axis=-1)
    return jnp.concatenate([r1, r2], axis=-2)  # [S, 2M, 12]


def _pose_from_P(P):
    """P [S, 3, 4] -> (R [S, 3, 3], t [S, 3]) with orthogonal R, det +1."""
    A = P[..., :3]
    U, s, Vt = linalg.svd3(A)
    R = U @ Vt
    det = jnp.linalg.det(R)
    # flip to proper rotation
    flip = jnp.where(det < 0, -1.0, 1.0)[..., None, None]
    R = R * flip
    scale = jnp.mean(s, axis=-1) * flip[..., 0, 0]
    t = P[..., 3] / jnp.where(jnp.abs(scale[..., None]) < 1e-12, 1e-12, scale[..., None])
    # enforce cheirality on average later via inlier count (both signs scored)
    return R, t


@functools.partial(jax.jit, static_argnames=("iters", "sample_size"))
def ransac_pnp(key, X, uv, valid, K, chi2_px, iters: int = 300,
               min_inliers: int = 10, sample_size: int = 6):
    """X [N, 3] world points, uv [N, 2] pixels, chi2_px [N] per-point squared
    pixel gates (5.991 * sigma2 of the octave).  Returns PnPResult."""
    N = X.shape[0]
    Kinv = jnp.linalg.inv(K)
    xn = (jnp.concatenate([uv, jnp.ones((N, 1), uv.dtype)], axis=1) @ Kinv.T)[:, :2]

    g = jax.random.uniform(key, (iters, N))
    g = jnp.where(valid[None, :], g, -1.0)
    _, samples = jax.lax.top_k(g, sample_size)

    A = _dlt_rows(X[samples], xn[samples])
    p = linalg.null_vector(A)
    P = p.reshape(iters, 3, 4)
    R, t = _pose_from_P(P)
    # both sign conventions (null vector sign ambiguity after scale division
    # is already handled by det flip; cheirality resolved by inlier count)
    Rs = jnp.concatenate([R, R], axis=0)
    ts = jnp.concatenate([t, -t], axis=0)

    def score(R, t):
        xc = jnp.einsum("sij,nj->sni", R, X) + t[:, None, :]
        z = xc[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = K[0, 0] * xc[..., 0] / zs + K[0, 2]
        v = K[1, 1] * xc[..., 1] / zs + K[1, 2]
        e = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
        return (e < chi2_px[None, :]) & (z > 0) & valid[None, :]

    inl = score(Rs, ts)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # refit on inliers of the best hypothesis
    w = inl[best]
    A_all = _dlt_rows(X[None], xn[None])[0] * jnp.repeat(w, 2)[:, None]
    p_r = linalg.null_vector(A_all[None])[0]
    R_r, t_r = _pose_from_P(p_r.reshape(1, 3, 4))
    R2 = jnp.concatenate([R_r, R_r], axis=0)
    t2 = jnp.concatenate([t_r, -t_r], axis=0)
    inl_r = score(R2, t2)
    counts_r = jnp.sum(inl_r, axis=1)
    bi = jnp.argmax(counts_r)
    use_refit = counts_r[bi] >= counts[best]
    R_f = jnp.where(use_refit, R2[bi], Rs[best])
    t_f = jnp.where(use_refit, t2[bi], ts[best])
    inl_f = jnp.where(use_refit, inl_r[bi], inl[best])
    n = jnp.sum(inl_f)
    return PnPResult(success=n >= min_inliers, R=R_f, t=t_f,
                     inliers=inl_f, n_inliers=n)
