"""Horn 1987 closed-form Sim(3) alignment + batched RANSAC.

Replaces src/vslam/src/Sim3Solver.cc: 3-point RANSAC similarity estimate
between matched 3D point sets of a loop keyframe pair, verified by
reprojection in both images.  The reference iterates hypotheses sequentially
with early exit (Sim3Solver::iterate); here all hypotheses are solved and
scored in one batched program (RANSAC params 0.99/20/300 from
LoopClosing.cc:313 arrive via SlamConfig).

Horn's method: rotation from the dominant eigenvector of the 4x4 quaternion
correlation matrix N (jacobi_eigh — no lapack), scale from the symmetric
ratio of deviations (Horn eq. 39, matching Sim3Solver::ComputeSim3's
mono path), translation from centroids.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from asdslam_tpu.estimators import linalg
from asdslam_tpu.geometry import se3


def horn_sim3(P1, P2, w=None):
    """Least-squares Sim3 (s, R, t) with P2 ~ s R P1 + t.

    P1, P2: [..., N, 3] matched points; w: optional [..., N] weights.
    Batched over leading dims.
    """
    if w is None:
        w = jnp.ones(P1.shape[:-1], P1.dtype)
    wn = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    c1 = jnp.sum(P1 * wn[..., None], axis=-2)
    c2 = jnp.sum(P2 * wn[..., None], axis=-2)
    X = (P1 - c1[..., None, :]) * wn[..., None]
    Y = P2 - c2[..., None, :]
    M = jnp.einsum("...ni,...nj->...ij", X, Y)  # [..., 3, 3]: M[a,b] = sum x_a y_b

    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], axis=-1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], axis=-1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], axis=-1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], axis=-1),
    ], axis=-2)
    _, V = linalg.jacobi_eigh(N)
    q = V[..., :, 0]  # dominant eigenvector = optimal quaternion (w, x, y, z)
    R = se3.quat_to_matrix(q)

    # scale: symmetric Horn: s = sqrt(sum|y|^2 / sum|x|^2) with weights
    num = jnp.sum(jnp.sum(Y * Y, axis=-1) * wn, axis=-1)
    den = jnp.sum(jnp.sum((P1 - c1[..., None, :]) ** 2, axis=-1) * wn, axis=-1)
    s = jnp.sqrt(num / jnp.clip(den, 1e-12))
    t = c2 - s[..., None] * jnp.einsum("...ij,...j->...i", R, c1)
    return s, R, t


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def refine_sim3(s0, R0, t0, P1, P2, uv1, uv2, valid, K,
                inv_sigma2_1, inv_sigma2_2,
                iters: int = 10, fix_scale: bool = False,
                chi2_th: float = 9.21):
    """GN refinement of a Sim3 (P2-frame = S(P1-frame)) minimizing two-way
    pixel reprojection — Optimizer::OptimizeSim3 parity (Optimizer.cc:1002+),
    with chi2 outlier down-weighting.  Jacobians by autodiff on the
    left-multiplicative sim3 tangent.  Returns (s, R, t, inlier_mask)."""
    from asdslam_tpu.geometry import sim3 as sim3m

    pose0 = sim3m.sim3_pack(jnp.asarray(s0).reshape(()), R0, t0)

    def proj(p):
        z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
        return jnp.stack([K[0, 0] * p[..., 0] / z + K[0, 2],
                          K[1, 1] * p[..., 1] / z + K[1, 2]], axis=-1)

    def residuals(packed):
        s, R, t = sim3m.sim3_unpack(packed)  # s scalar
        p2h = sim3m.transform(s, R, t, P1)
        si, Ri, ti = sim3m.inverse(s, R, t)
        p1h = sim3m.transform(si, Ri, ti, P2)
        r2 = (proj(p2h) - uv2) * jnp.sqrt(inv_sigma2_2)[:, None]
        r1 = (proj(p1h) - uv1) * jnp.sqrt(inv_sigma2_1)[:, None]
        return jnp.concatenate([r1, r2], axis=0)  # [2N, 2]

    def chi2_of(packed):
        r = residuals(packed)
        N = P1.shape[0]
        return jnp.sum(r[:N] ** 2, axis=1) + jnp.sum(r[N:] ** 2, axis=1)

    def step(carry, _):
        packed, lam = carry
        w_obs = valid.astype(jnp.float32)
        w2 = jnp.concatenate([w_obs, w_obs])
        chi2 = chi2_of(packed)
        w_in = (chi2 <= chi2_th).astype(jnp.float32)
        w2 = w2 * jnp.concatenate([w_in, w_in])

        def r_of(xi):
            return residuals(sim3m.retract(packed, xi))

        z = jnp.zeros(7)
        r = r_of(z)
        J = jax.jacfwd(r_of)(z)  # [2N, 2, 7]
        if fix_scale:
            J = J.at[..., 6].set(0.0)
        H = jnp.einsum("oki,o,okj->ij", J, w2, J) + (lam + 1e-8) * jnp.eye(7)
        g = jnp.einsum("oki,o,ok->i", J, w2, r)
        dx = -linalg.chol_solve_small(H, g)
        if fix_scale:
            dx = dx.at[6].set(0.0)
        cand = sim3m.retract(packed, dx)
        better = jnp.sum(chi2_of(cand) * w_obs) < jnp.sum(chi2 * w_obs)
        packed = jnp.where(better, cand, packed)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return (packed, lam), None

    (packed, _), _ = jax.lax.scan(step, (pose0, jnp.asarray(1e-4)), None, length=iters)
    s, R, t = sim3m.sim3_unpack(packed)
    chi2 = chi2_of(packed)
    inl = valid & (chi2 <= chi2_th)
    return s, R, t, inl


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def ransac_sim3(
    key, P1, P2, uv1, uv2, valid, K,
    chi2_px1, chi2_px2,
    iters: int = 300, min_inliers: int = 20, fix_scale: bool = False,
):
    """Batched-hypothesis RANSAC Horn alignment.

    P1, P2: [N, 3] matched 3D points in the two camera frames
    uv1, uv2: [N, 2] their pixel observations in each keyframe
    chi2_px*: [N] per-match squared-pixel thresholds (9.210 * sigma2 of the
    keypoint octave — Sim3Solver.cc:141-144)
    Inlier check mirrors Sim3Solver::CheckInliers: project P2 through S12
    into image 1 and P1 through S21 into image 2.
    """
    N = P1.shape[0]
    g = jax.random.uniform(key, (iters, N))
    g = jnp.where(valid[None, :], g, -1.0)
    _, samples = jax.lax.top_k(g, 3)  # [iters, 3]

    s_h, R_h, t_h = horn_sim3(P1[samples], P2[samples])  # hypothesis: P2 = S21(P1)
    if fix_scale:
        s_h = jnp.ones_like(s_h)

    def count_inliers(s, R, t):
        # S21: cam1 -> cam2
        p2h = s[..., None, None] * jnp.einsum("...ij,nj->...ni", R, P1) + t[..., None, :]
        # S12 = inverse
        si, Ri, ti = (1.0 / s,
                      jnp.swapaxes(R, -1, -2),
                      -jnp.einsum("...ij,...j->...i", jnp.swapaxes(R, -1, -2), t) / s[..., None])
        p1h = si[..., None, None] * jnp.einsum("...ij,nj->...ni", Ri, P2) + ti[..., None, :]

        def proj(p):
            z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
            return jnp.stack([K[0, 0] * p[..., 0] / z + K[0, 2],
                              K[1, 1] * p[..., 1] / z + K[1, 2]], axis=-1)

        e2 = jnp.sum((proj(p2h) - uv2) ** 2, axis=-1)
        e1 = jnp.sum((proj(p1h) - uv1) ** 2, axis=-1)
        ok = (e1 < chi2_px1) & (e2 < chi2_px2) & valid
        return ok

    inl = count_inliers(s_h, R_h, t_h)  # [iters, N]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # refit on the best hypothesis' inliers
    w = inl[best].astype(P1.dtype)
    s_r, R_r, t_r = horn_sim3(P1, P2, w)
    if fix_scale:
        s_r = jnp.ones_like(s_r)
    inl_r = count_inliers(s_r[None], R_r[None], t_r[None])[0]
    use_refit = jnp.sum(inl_r) >= counts[best]
    s_f = jnp.where(use_refit, s_r, s_h[best])
    R_f = jnp.where(use_refit, R_r, R_h[best])
    t_f = jnp.where(use_refit, t_r, t_h[best])
    inl_f = jnp.where(use_refit, inl_r, inl[best])
    n = jnp.sum(inl_f)
    return Sim3Result(success=n >= min_inliers, s=s_f, R=R_f, t=t_f,
                      inliers=inl_f, n_inliers=n)


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_sim3_align(X_src, X_dst, valid, iters: int = 20,
                        huber_delta: float = 0.5):
    """3D-3D Sim3 alignment of matched point sets — Optimizer::
    OptimizeSim3Align parity (src/vslam/src/Optimizer.cc:1196, 1355): align
    a freshly-built local map onto the loaded global map in localization
    mode from matched map-point pairs.

    Returns (s, R, t, inlier_mask) minimizing the robust 3D residual
    || s R x_src + t - x_dst ||.  Horn closed form seeds a GN refinement
    with Huber weighting (point-pair outliers from descriptor mismatches
    must not corrupt the fit)."""
    w0 = valid.astype(X_src.dtype)
    s0, R0, t0 = horn_sim3(X_src, X_dst, w=w0)

    def residuals(packed):
        s, R, t = packed
        r = s * X_src @ R.T + t - X_dst
        return r

    def step(carry, _):
        s, R, t = carry
        r = residuals((s, R, t))
        nrm = jnp.linalg.norm(r, axis=1)
        w_h = w0 * jnp.where(nrm <= huber_delta, 1.0,
                             huber_delta / jnp.clip(nrm, 1e-9))

        def r_of(xi):
            # tangent: [3 rot, 3 trans, 1 log-scale]
            from asdslam_tpu.geometry import se3 as se3m
            dR = se3m.so3_exp(xi[:3])
            ds = jnp.exp(xi[6])
            rr = (s * ds) * X_src @ (dR @ R).T + (t + xi[3:6]) - X_dst
            return (rr * w_h[:, None]).reshape(-1)

        J = jax.jacfwd(r_of)(jnp.zeros(7))
        r_w = (r * w_h[:, None]).reshape(-1)
        H = J.T @ J + 1e-8 * jnp.eye(7)
        dx = -linalg.chol_solve_small(H, J.T @ r_w)
        from asdslam_tpu.geometry import se3 as se3m
        R_new = se3m.so3_exp(dx[:3]) @ R
        s_new, t_new = s * jnp.exp(dx[6]), t + dx[3:6]
        # accept only on (weighted) residual non-increase: chol_solve_small
        # clamps non-positive pivots, so an ill-conditioned f32 factorization
        # can produce a huge finite step — gate it instead of applying it
        # unconditionally (there is no LM loop here to reject it later)
        cost_old = jnp.sum((r * w_h[:, None]) ** 2)
        r_new = (s_new * X_src @ R_new.T + t_new - X_dst) * w_h[:, None]
        ok = jnp.isfinite(dx).all() & (jnp.sum(r_new ** 2) <= cost_old)
        s_out = jnp.where(ok, s_new, s)
        R_out = jnp.where(ok, R_new, R)
        t_out = jnp.where(ok, t_new, t)
        return (s_out, R_out, t_out), None

    (s, R, t), _ = jax.lax.scan(step, (s0, R0, t0), None, length=iters)
    r = residuals((s, R, t))
    inliers = valid & (jnp.linalg.norm(r, axis=1) <= huber_delta)
    return s, R, t, inliers
