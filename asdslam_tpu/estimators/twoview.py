"""Two-view monocular initialization: batched-hypothesis RANSAC for H and F,
model selection, and SE(3) reconstruction with cheirality checks.

TPU-native re-design of src/vslam/src/Initializer.cc:

- the reference races FindHomography/FindFundamental in two std::threads with
  200 sequential RANSAC iterations each; here ALL hypotheses for BOTH models
  are solved and scored in one batched program (no early exit — fixed shapes);
- per-hypothesis 8-point/4-point systems are solved with inverse power
  iteration (estimators/linalg.py) instead of per-sample cv::SVD;
- model selection keeps the reference rule RH = SH/(SH+SF) > 0.40
  (Initializer.cc:112-117);
- reconstruction: E = K^T F K decomposed via iterative svd3; homography via
  Faugeras (ReconstructH, Initializer.cc:~760); candidate poses scored by
  batched triangulation + cheirality/parallax/reprojection (CheckRT,
  Initializer.cc:506+).

All scoring constants mirror the reference: chi2 thresholds 3.841 (F
epipolar) / 5.991 (H transfer and F score cap), score increments
th_score - chi2, sigma from cfg.init_sigma.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from asdslam_tpu.estimators import linalg
from asdslam_tpu.geometry import triangulation

CHI2_F = 3.841
CHI2_H = 5.991
TH_SCORE = 5.991


class TwoViewResult(NamedTuple):
    success: jnp.ndarray      # bool scalar
    used_homography: jnp.ndarray
    R: jnp.ndarray            # [3, 3] pose of view 2 w.r.t world(=view1)
    t: jnp.ndarray            # [3]
    points: jnp.ndarray       # [N, 3] triangulated points (world = cam1)
    good: jnp.ndarray         # [N] bool: triangulated inlier
    score_h: jnp.ndarray
    score_f: jnp.ndarray


# --------------------------------------------------------------------------- #
# Hartley normalization
# --------------------------------------------------------------------------- #
def _normalize_points(x, valid):
    w = valid.astype(x.dtype)
    n = jnp.clip(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    d = jnp.abs(x - mean) * w[:, None]
    mean_dev = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.clip(mean_dev, 1e-8)
    xn = (x - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]],
         [0.0, s[1], -mean[1] * s[1]],
         [0.0, 0.0, 1.0]], x.dtype)
    return xn, T


# --------------------------------------------------------------------------- #
# Model solvers (batched over hypotheses)
# --------------------------------------------------------------------------- #
def _f_rows(p1, p2):
    """Epipolar constraint rows x2^T F x1 = 0: [..., 9]."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )


def _h_rows(p1, p2):
    """DLT homography rows (2 per correspondence): [..., 2, 9]."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    r2 = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], axis=-1)
    return jnp.stack([r1, r2], axis=-2)


def _solve_f(p1, p2):
    """8-point fundamental from sampled points [S, 8, 2] x2 -> F [S, 3, 3]."""
    A = _f_rows(p1, p2)  # [S, 8, 9]
    f = linalg.null_vector(A)
    return f.reshape(f.shape[:-1] + (3, 3))


def _solve_h(p1, p2):
    """DLT homography from sampled points [S, 8, 2] x2 -> H [S, 3, 3]."""
    A = _h_rows(p1, p2).reshape(p1.shape[:-2] + (2 * p1.shape[-2], 9))
    h = linalg.null_vector(A)
    return h.reshape(h.shape[:-1] + (3, 3))


# --------------------------------------------------------------------------- #
# Scoring (CheckFundamental / CheckHomography parity)
# --------------------------------------------------------------------------- #
def _score_f(F, x1, x2, valid, sigma):
    """F: [S, 3, 3]; x1, x2: [N, 2] pixels. Returns (score [S], inliers [S, N])."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=1)  # [N, 3]
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=1)
    inv_s2 = 1.0 / (sigma * sigma)

    l2 = jnp.einsum("sij,nj->sni", F, h1)          # epipolar lines in im2
    num2 = jnp.einsum("sni,ni->sn", l2, h2) ** 2
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    chi2_2 = num2 / jnp.clip(den2, 1e-12) * inv_s2

    l1 = jnp.einsum("sji,nj->sni", F, h2)          # lines in im1 via F^T
    num1 = jnp.einsum("sni,ni->sn", l1, h1) ** 2
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    chi2_1 = num1 / jnp.clip(den1, 1e-12) * inv_s2

    ok1 = chi2_1 <= CHI2_F
    ok2 = chi2_2 <= CHI2_F
    sc = (jnp.where(ok1, TH_SCORE - chi2_1, 0.0)
          + jnp.where(ok2, TH_SCORE - chi2_2, 0.0))
    sc = sc * valid[None, :]
    return jnp.sum(sc, axis=1), ok1 & ok2 & (valid[None, :] > 0)


def _score_h(H, x1, x2, valid, sigma):
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=1)
    inv_s2 = 1.0 / (sigma * sigma)
    Hinv = jnp.linalg.inv(H)

    p12 = jnp.einsum("sij,nj->sni", H, h1)
    p12 = p12[..., :2] / jnp.where(jnp.abs(p12[..., 2:]) < 1e-12, 1e-12, p12[..., 2:])
    chi2_2 = jnp.sum((p12 - x2[None]) ** 2, axis=-1) * inv_s2

    p21 = jnp.einsum("sij,nj->sni", Hinv, h2)
    p21 = p21[..., :2] / jnp.where(jnp.abs(p21[..., 2:]) < 1e-12, 1e-12, p21[..., 2:])
    chi2_1 = jnp.sum((p21 - x1[None]) ** 2, axis=-1) * inv_s2

    ok1 = chi2_1 <= CHI2_H
    ok2 = chi2_2 <= CHI2_H
    sc = (jnp.where(ok1, TH_SCORE - chi2_1, 0.0)
          + jnp.where(ok2, TH_SCORE - chi2_2, 0.0))
    sc = sc * valid[None, :]
    return jnp.sum(sc, axis=1), ok1 & ok2 & (valid[None, :] > 0)


# --------------------------------------------------------------------------- #
# Pose candidate scoring (CheckRT parity)
# --------------------------------------------------------------------------- #
def _check_rt(R, t, xn1, xn2, valid, sigma_norm, parallax_th=0.99998):
    """Triangulate all correspondences for one (R, t) candidate and count the
    good ones.  xn*: [N, 2] normalized coords.  sigma_norm: pixel sigma / f.

    Returns (n_good, parallax_metric, good_mask [N], points [N, 3])."""
    I = jnp.eye(3, dtype=R.dtype)
    z3 = jnp.zeros(3, R.dtype)
    N = xn1.shape[0]
    X = triangulation.triangulate_midpoint(
        jnp.broadcast_to(I, (N, 3, 3)), jnp.broadcast_to(z3, (N, 3)),
        jnp.broadcast_to(R, (N, 3, 3)), jnp.broadcast_to(t, (N, 3)), xn1, xn2)
    finite = jnp.all(jnp.isfinite(X), axis=-1)
    X = jnp.where(finite[:, None], X, 0.0)

    e1, z1 = triangulation.reprojection_error2(I, z3, X, xn1)
    e2, z2 = triangulation.reprojection_error2(R, t, X, xn2)
    c1 = z3
    c2 = -R.T @ t
    cosp = triangulation.parallax_cos(c1, c2, X)

    th2 = 4.0 * sigma_norm * sigma_norm
    # Cheirality kills a point only when parallax is meaningful: near-infinite
    # points jitter across z=0 and still COUNT toward nGood (reference
    # CheckRT, Initializer.cc:59-66 — `z<=0 && cosParallax<0.99998`).  On
    # street scenes most matches are distant; requiring parallax to count
    # would make the 0.9*N ReconstructF gate unreachable.
    cheir = ((z1 > 0) | (cosp >= parallax_th)) & ((z2 > 0) | (cosp >= parallax_th))
    counted = valid & finite & cheir & (e1 < th2) & (e2 < th2)
    n_good = jnp.sum(counted.astype(jnp.int32))
    # only well-conditioned (parallax) points become map points
    # (vbGood, Initializer.cc:95-96)
    good = counted & (cosp < parallax_th) & (z1 > 0) & (z2 > 0)

    # parallax metric: cos at the 50th-best-parallax counted point (ref takes
    # the min(50, n)-th smallest cos)
    cos_masked = jnp.where(counted, cosp, 1.0)
    smallest = -jax.lax.top_k(-cos_masked, 50)[0]  # 50 smallest cos
    k = jnp.minimum(n_good, 50) - 1
    par_cos = smallest[jnp.clip(k, 0, 49)]
    return n_good, par_cos, good, X


def _decompose_e(E):
    """E -> 4 candidate (R, t).  Iterative svd3; W-trick."""
    U, s, Vt = linalg.svd3(E[None])
    U, Vt = U[0], Vt[0]
    # enforce rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tt = U[:, 2]
    tt = tt / jnp.clip(jnp.linalg.norm(tt), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([tt, -tt, tt, -tt])
    return Rs, ts


def _decompose_h(H, K):
    """Faugeras 1988 homography decomposition -> 8 candidate (R, t).

    Mirrors Initializer::ReconstructH (Initializer.cc:~760): A = K^-1 H K,
    SVD(A) = U diag(d1,d2,d3) V^T, 8 solutions for d' = ±d2.
    """
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H @ K
    U, s, Vt = linalg.svd3(A[None])
    U, Vt = U[0], Vt[0]
    V = Vt.T
    sdet = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = s[0, 0], s[0, 1], s[0, 2]

    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / jnp.clip(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / jnp.clip(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' = +d2
    aux_st = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.clip((d1 + d3) * d2, 1e-12)
    st = jnp.array([aux_st, -aux_st, -aux_st, aux_st])
    ct = (d2 * d2 + d1 * d3) / jnp.clip((d1 + d3) * d2, 1e-12)

    def rot_p(ctheta, stheta):
        return jnp.array([[ctheta, 0.0, -stheta], [0.0, 1.0, 0.0], [stheta, 0.0, ctheta]])

    Rs_p = jax.vmap(lambda sth: rot_p(ct, sth))(st)           # [4, 3, 3]
    tp = jax.vmap(lambda x1, x3: (d1 - d3) * jnp.array([x1, 0.0, -x3]))(x1s, x3s)

    # case d' = -d2
    aux_sp = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.clip((d1 - d3) * d2, 1e-12)
    sp = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])
    cp = (d1 * d3 - d2 * d2) / jnp.clip((d1 - d3) * d2, 1e-12)

    def rot_n(cphi, sphi):
        return jnp.array([[cphi, 0.0, sphi], [0.0, -1.0, 0.0], [sphi, 0.0, -cphi]])

    Rs_n = jax.vmap(lambda sph: rot_n(cp, sph))(sp)
    tn = jax.vmap(lambda x1, x3: (d1 + d3) * jnp.array([x1, 0.0, x3]))(x1s, x3s)

    Rs = jnp.concatenate([Rs_p, Rs_n], axis=0)   # [8, 3, 3] (in A's frame)
    ts = jnp.concatenate([tp, tn], axis=0)
    # map back: R = s U R' V^T, t = U t'
    Rs = sdet * jnp.einsum("ij,njk,lk->nil", U, Rs, V)
    ts = jnp.einsum("ij,nj->ni", U, ts)
    ts = ts / jnp.clip(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


# --------------------------------------------------------------------------- #
# Full initializer
# --------------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=("iters", "min_triangulated"))
def initialize_two_view(
    key,
    uv1, uv2, valid,
    K,
    sigma: float = 1.0,
    iters: int = 200,
    min_triangulated: int = 50,
    min_parallax_cos: float = 0.9998476952,  # cos(1 deg)
):
    """Full two-view bootstrap from matched undistorted pixel coords.

    uv1, uv2: [N, 2]; valid: [N]; K: [3, 3] intrinsics.
    Returns TwoViewResult. (World frame = camera 1; |t| = 1 scale.)
    """
    N = uv1.shape[0]
    fmean = 0.5 * (K[0, 0] + K[1, 1])

    # ---- sample hypothesis sets (8 distinct valid indices per hypothesis)
    g = jax.random.uniform(key, (iters, N))
    g = jnp.where(valid[None, :], g, -1.0)
    _, samples = jax.lax.top_k(g, 8)  # [iters, 8]

    p1n, T1 = _normalize_points(uv1, valid)
    p2n, T2 = _normalize_points(uv2, valid)
    s1 = p1n[samples]  # [iters, 8, 2]
    s2 = p2n[samples]

    # ---- fundamental (RANSAC, then least-squares refit on all inliers —
    # the refit is an improvement over the reference, which keeps the raw
    # 8-point model of the best iteration)
    Fn = _solve_f(s1, s2)
    F = jnp.einsum("ji,sjk,kl->sil", T2, Fn, T1)  # T2^T Fn T1
    f_scores, f_inl = _score_f(F, uv1, uv2, valid, sigma)
    fi = jnp.argmax(f_scores)
    f_inliers0 = f_inl[fi]
    rows_f = _f_rows(p1n, p2n) * f_inliers0[:, None]
    f_refit = linalg.null_vector(rows_f[None])[0].reshape(3, 3)
    F_refit = T2.T @ f_refit @ T1
    # no explicit rank-2 projection: the inlier refit is near rank-2 already
    # (sigma3/sigma1 ~ 1e-7) and the E-decomposition zeroes sigma3 anyway;
    # an svd3 round-trip here would add more error than it removes.
    sc_r, inl_r = _score_f(F_refit[None], uv1, uv2, valid, sigma)
    better_f = sc_r[0] > f_scores[fi]
    SF = jnp.where(better_f, sc_r[0], f_scores[fi])
    bestF = jnp.where(better_f, F_refit, F[fi])
    bestF = bestF / jnp.clip(jnp.abs(bestF[2, 2]), 1e-12)
    f_inliers = jnp.where(better_f, inl_r[0], f_inliers0)

    # ---- homography (same RANSAC + inlier refit)
    Hn = _solve_h(s1, s2)
    Hm = jnp.einsum("ij,sjk,kl->sil", jnp.linalg.inv(T2), Hn, T1)
    h_scores, h_inl = _score_h(Hm, uv1, uv2, valid, sigma)
    hi = jnp.argmax(h_scores)
    h_inliers0 = h_inl[hi]
    rows_h = (_h_rows(p1n, p2n) * h_inliers0[:, None, None]).reshape(-1, 9)
    h_refit = linalg.null_vector(rows_h[None])[0].reshape(3, 3)
    H_refit = jnp.linalg.inv(T2) @ h_refit @ T1
    sc_hr, inl_hr = _score_h(H_refit[None], uv1, uv2, valid, sigma)
    better_h = sc_hr[0] > h_scores[hi]
    SH = jnp.where(better_h, sc_hr[0], h_scores[hi])
    bestH = jnp.where(better_h, H_refit, Hm[hi])
    bestH = bestH / jnp.clip(jnp.abs(bestH[2, 2]), 1e-12)
    h_inliers = jnp.where(better_h, inl_hr[0], h_inliers0)

    use_h = SH / jnp.clip(SH + SF, 1e-12) > 0.40

    # ---- reconstruct both, select at the end (batched; no host branch)
    Kinv = jnp.linalg.inv(K)
    h1 = jnp.concatenate([uv1, jnp.ones((N, 1), uv1.dtype)], axis=1)
    h2 = jnp.concatenate([uv2, jnp.ones((N, 1), uv2.dtype)], axis=1)
    xn1 = (h1 @ Kinv.T)[:, :2]
    xn2 = (h2 @ Kinv.T)[:, :2]
    sigma_norm = sigma / fmean

    E = K.T @ bestF @ K
    Rf, tf = _decompose_e(E)                     # [4]
    Rh, th = _decompose_h(bestH, K)              # [8]
    Rc = jnp.concatenate([Rf, Rh], axis=0)       # [12, 3, 3]
    tc = jnp.concatenate([tf, th], axis=0)
    inl = jnp.concatenate(
        [jnp.tile(f_inliers[None], (4, 1)), jnp.tile(h_inliers[None], (8, 1))], axis=0
    )
    model_is_h = jnp.concatenate([jnp.zeros(4, bool), jnp.ones(8, bool)])

    n_good, par_cos, good, X = jax.vmap(
        lambda R, t, v: _check_rt(R, t, xn1, xn2, v, sigma_norm)
    )(Rc, tc, inl)

    # restrict to the selected model's candidates
    active = jnp.where(use_h, model_is_h, ~model_is_h)
    scores = jnp.where(active, n_good, -1)
    best = jnp.argmax(scores)
    best_good = scores[best]
    # Ambiguity check (ReconstructF/H nsimilar): evaluated on PARALLAX-VALID
    # triangulations only.  The counted total includes near-infinite points
    # whose cheirality is unknowable (CheckRT waives z<=0 for
    # cosParallax>=0.99998), and the twisted-pair wrong solution of a
    # planar/distant scene collects them freely — discriminating on
    # triangulable points keeps the reference's intent (reject genuinely
    # ambiguous reconstructions) without rejecting every street scene.
    n_tri = jnp.sum(good.astype(jnp.int32), axis=1)
    tri_scores = jnp.where(active, n_tri, -1)
    best_tri = tri_scores[best]
    n_similar = jnp.sum((tri_scores > 0.7 * best_tri) & (tri_scores > 0) & active)

    n_inl = jnp.sum(jnp.where(use_h, h_inliers, f_inliers).astype(jnp.int32))
    min_good = jnp.maximum(jnp.int32(min_triangulated),
                           (0.9 * n_inl).astype(jnp.int32))
    success = ((best_good >= min_good)
               & (n_similar == 1)
               & (par_cos[best] < min_parallax_cos))

    return TwoViewResult(
        success=success,
        used_homography=use_h,
        R=Rc[best], t=tc[best],
        points=X[best], good=good[best],
        score_h=SH, score_f=SF,
    )
