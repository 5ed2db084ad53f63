"""Bundle adjustment: Gauss-Newton/Levenberg-Marquardt with Schur complement,
replacing g2o (src/vslam/src/Optimizer.cc).

Three entry points, all fixed-shape jitted programs:

- `pose_only_optimize` — motion-only BA (PoseOptimization parity,
  Optimizer.cc:239-413): 4 rounds x 10 LM iterations, Huber sqrt(5.991),
  chi2 outlier gating between rounds on the 2-DoF 95% quantile.
- `bundle_adjust` — local/global BA (LocalBundleAdjustment /
  BundleAdjustment parity, Optimizer.cc:43-237, 415-735): cameras +
  landmarks, fixed-camera anchors, Huber, Schur-complement reduction — the
  3x3 landmark blocks are inverted batched, the reduced camera system S is
  assembled densely ([6C, 6C]; the optimized-camera count is bounded by the
  window config) and solved with Cholesky.

Residual convention: r = project(R_cw X + t_cw) - uv_observed, weighted by
inv_sigma2 of the keypoint's pyramid level (matching the reference's
information matrices).  Pose tangent update is LEFT-multiplicative
(exp(xi) * T), matching se3.pose_retract.

TPU notes: everything is batched over observations; the only dense solve is
S (6C x 6C) — small for local BA windows, and one Cholesky on the MXU for
global BA.  No data-dependent shapes: invalid observations carry zero weight.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from asdslam_tpu.geometry import se3
from asdslam_tpu.estimators.linalg import inv3x3, chol_solve_small

CHI2_MONO = 5.991


class Obs(NamedTuple):
    """Fixed-capacity observation table for BA.

    cam_idx: [O] int32 index into the camera array
    pt_idx:  [O] int32 index into the point array
    uv:      [O, 2] undistorted pixel observation
    inv_sigma2: [O] information weight (1/sigma^2 of the keypoint level)
    valid:   [O] bool
    """

    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uv: jnp.ndarray
    inv_sigma2: jnp.ndarray
    valid: jnp.ndarray


def _project_residuals(poses7, points, obs: Obs, K):
    """Residuals + Jacobians for all observations.

    poses7: [C, 7]; points: [P, 3]; K: [3, 3] intrinsics.
    Returns r [O, 2], Jc [O, 2, 6] (w.r.t. the observing camera's tangent,
    left-mult), Jp [O, 2, 3] (w.r.t. the point), z [O] depths.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    R, t = se3.pose_unpack(poses7[obs.cam_idx])  # [O, 3, 3], [O, 3]
    X = points[obs.pt_idx]
    xc = jnp.einsum("oij,oj->oi", R, X) + t
    z = xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = fx * xc[:, 0] / zs + cx
    v = fy * xc[:, 1] / zs + cy
    r = jnp.stack([u, v], axis=1) - obs.uv

    zi = 1.0 / zs
    # d(u,v)/d(xc)
    Jproj = jnp.stack(
        [
            jnp.stack([fx * zi, jnp.zeros_like(zi), -fx * xc[:, 0] * zi * zi], axis=-1),
            jnp.stack([jnp.zeros_like(zi), fy * zi, -fy * xc[:, 1] * zi * zi], axis=-1),
        ],
        axis=1,
    )  # [O, 2, 3]
    # d(xc)/d(xi): left-mult exp(xi) T => dxc/domega = -[xc]x, dxc/dv = I
    Jxi = jnp.concatenate([-se3.hat(xc), jnp.broadcast_to(jnp.eye(3), (xc.shape[0], 3, 3))], axis=2)  # [O, 3, 6]
    Jc = Jproj @ Jxi          # [O, 2, 6]
    Jp = Jproj @ R            # [O, 2, 3]
    return r, Jc, Jp, z


def _huber_weight(chi2, delta2):
    """IRLS weight for the Huber kernel on chi2 (already sigma-normalized)."""
    s = jnp.sqrt(jnp.clip(chi2, 1e-12))
    d = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, 1.0, d / s)


# --------------------------------------------------------------------------- #
# Motion-only BA
# --------------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_only_optimize(
    pose7, points, uv, inv_sigma2, valid, K,
    rounds: int = 4, iters: int = 10, chi2_th: float = CHI2_MONO,
    huber: bool = True,
):
    """Optimize a single camera pose against fixed 3D points.

    pose7: [7]; points: [N, 3] world; uv: [N, 2]; valid: [N] bool.
    Returns (pose7_opt, inlier_mask [N], n_inliers).
    Mirrors Optimizer::PoseOptimization: `rounds` rounds of `iters` LM steps,
    re-classifying chi2 > chi2_th observations as outliers between rounds
    (they re-enter if their error drops below the gate, as in the reference).
    """
    N = points.shape[0]
    obs = Obs(
        cam_idx=jnp.zeros((N,), jnp.int32),
        pt_idx=jnp.arange(N, dtype=jnp.int32),
        uv=uv, inv_sigma2=inv_sigma2, valid=valid,
    )
    delta2 = CHI2_MONO

    def chi2_of(pose):
        r, _, _, z = _project_residuals(pose[None], points, obs, K)
        chi2 = jnp.sum(r * r, axis=1) * inv_sigma2
        return chi2, z

    inliers = valid

    def lm_round(pose, inliers, use_huber):
        def cost_fn(pose):
            chi2, z = chi2_of(pose)
            w_h = _huber_weight(chi2, delta2) if use_huber else jnp.ones_like(chi2)
            # Huber cost approximation: rho(chi2)
            c = jnp.where(chi2 <= delta2, chi2,
                          2.0 * jnp.sqrt(delta2 * jnp.clip(chi2, 1e-12)) - delta2)
            c = jnp.where(inliers, c, 0.0)
            return jnp.sum(c)

        def step(state, _):
            pose, lam, cost = state
            r, Jc, _, z = _project_residuals(pose[None], points, obs, K)
            chi2 = jnp.sum(r * r, axis=1) * inv_sigma2
            w_h = _huber_weight(chi2, delta2) if use_huber else jnp.ones_like(chi2)
            w = inv_sigma2 * w_h * inliers.astype(r.dtype)
            H = jnp.einsum("oki,o,okj->ij", Jc, w, Jc)
            g = jnp.einsum("oki,o,ok->i", Jc, w, r)
            Hd = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-9 * jnp.eye(6)
            dx = -chol_solve_small(Hd, g)
            cand = se3.pose_retract(pose, dx)
            new_cost = cost_fn(cand)
            accept = new_cost < cost
            pose = jnp.where(accept, cand, pose)
            lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9), jnp.minimum(lam * 4.0, 1e6))
            cost = jnp.where(accept, new_cost, cost)
            return (pose, lam, cost), None

        state0 = (pose, jnp.array(1e-3, pose.dtype), cost_fn(pose))
        (pose, _, _), _ = jax.lax.scan(step, state0, None, length=iters)
        return pose

    pose = pose7
    for rd in range(rounds):
        use_huber = huber and rd < rounds - 1  # last round: plain kernel (g2o parity)
        pose = lm_round(pose, inliers, use_huber)
        chi2, z = chi2_of(pose)
        inliers = valid & (chi2 <= chi2_th) & (z > 0)

    n_in = jnp.sum(inliers.astype(jnp.int32))
    return pose, inliers, n_in


# --------------------------------------------------------------------------- #
# Full BA with Schur complement
# --------------------------------------------------------------------------- #
class BAProblem(NamedTuple):
    """Fixed-shape BA problem.

    poses7:   [C, 7] all cameras (optimized first, then fixed anchors)
    n_opt:    static int — first n_opt cameras are optimized
    points:   [P, 3]
    pt_valid: [P] bool
    obs:      Obs (cam_idx into poses7, pt_idx into points)
    pt_obs:   [P, Kmax] int32 — indices into obs of each point's
              observations (-1 pad); host-assembled
    """

    poses7: jnp.ndarray
    points: jnp.ndarray
    pt_valid: jnp.ndarray
    obs: Obs
    pt_obs: jnp.ndarray


def build_pt_obs(pt_idx, valid, n_points: int, k_max: int):
    """Host helper: [P, Kmax] table of observation indices per point.
    Vectorized — the per-row Python loop cost ~2 s per local BA at the
    reference window shape (32k observations, KF rate)."""
    import numpy as np

    pt_idx = np.asarray(pt_idx)
    valid = np.asarray(valid)
    rows = np.nonzero(valid & (pt_idx >= 0) & (pt_idx < n_points))[0]
    p = pt_idx[rows]
    order = np.argsort(p, kind="stable")
    rows, p = rows[order], p[order]
    first = np.searchsorted(p, np.arange(n_points))
    rank = np.arange(len(p)) - first[p]
    keep = rank < k_max
    table = np.full((n_points, k_max), -1, np.int32)
    table[p[keep], rank[keep]] = rows[keep]
    return table


# Per-camera trust region default (tangent units per LM iteration).  The
# tuned pipeline (local BA windows, post-essential-graph GBA) is validated
# with 2.0; callers needing legitimately large corrections (e.g. GBA with no
# prior graph alignment) should raise it — total camera motion is capped at
# iters * trust_region.
CAM_TRUST_REGION = 2.0


@functools.partial(jax.jit,
                   static_argnames=("n_opt", "iters", "huber", "trust_region"))
def bundle_adjust(
    problem: BAProblem, K, n_opt: int,
    iters: int = 10, huber: bool = True, chi2_th: float = CHI2_MONO,
    trust_region: float = CAM_TRUST_REGION,
):
    """LM bundle adjustment over `n_opt` cameras + all valid points.

    Returns (poses7 [C, 7], points [P, 3], obs_chi2 [O]).
    Landmarks are marginalized per-point (Schur); the reduced camera system
    [6*n_opt, 6*n_opt] is solved densely.
    """
    poses7 = problem.poses7
    points = problem.points
    obs = problem.obs
    pt_obs = problem.pt_obs
    C = poses7.shape[0]
    P = points.shape[0]
    O = obs.uv.shape[0]
    delta2 = CHI2_MONO

    obs_w_valid = obs.valid.astype(jnp.float32)
    pt_w = problem.pt_valid

    def total_cost(poses7, points):
        r, _, _, z = _project_residuals(poses7, points, obs, K)
        chi2 = jnp.sum(r * r, axis=1) * obs.inv_sigma2
        c = jnp.where(chi2 <= delta2, chi2,
                      2.0 * jnp.sqrt(delta2 * jnp.clip(chi2, 1e-12)) - delta2) if huber else chi2
        return jnp.sum(c * obs_w_valid)

    def step(state, _):
        poses7, points, lam, cost = state
        r, Jc, Jp, z = _project_residuals(poses7, points, obs, K)
        chi2 = jnp.sum(r * r, axis=1) * obs.inv_sigma2
        w_h = _huber_weight(chi2, delta2) if huber else jnp.ones_like(chi2)
        w = obs.inv_sigma2 * w_h * obs_w_valid

        opt_cam = (obs.cam_idx < n_opt)
        wc = w * opt_cam.astype(w.dtype)

        # TPU scatter-adds serialize per element — every accumulation in
        # this step is a gather or a (one-hot) matmul instead.  Camera
        # blocks: one-hot over the few optimized cameras.
        oh_cam = (obs.cam_idx[:, None] == jnp.arange(n_opt)[None, :]
                  ).astype(r.dtype) * wc[:, None]                  # [O, A]
        JcJc = jnp.einsum("oki,okj->oij", Jc, Jc)
        Hcc = jnp.einsum("oa,oij->aij", oh_cam, JcJc)
        Jcr = jnp.einsum("oki,ok->oi", Jc, r)
        gc = jnp.einsum("oa,oi->ai", oh_cam, Jcr)

        # point blocks: gather each point's observations via pt_obs
        po = jnp.clip(pt_obs, 0, O - 1)
        po_valid = (pt_obs >= 0)
        w_p = w[po] * po_valid                                     # [P, K]
        Jp_p = Jp[po]                                              # [P, K, 2, 3]
        r_p = r[po]
        Hpp = jnp.einsum("pkli,pk,pklj->pij", Jp_p, w_p, Jp_p)
        gp = jnp.einsum("pkli,pk,pkl->pi", Jp_p, w_p, r_p)

        # LM damping: H += lam * diag(H) (diag-embed via d[..., :, None] * I)
        dcc = jnp.maximum(jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-6)
        Hcc = Hcc + lam * dcc[:, :, None] * jnp.eye(6)[None]
        dpp = jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6)
        Hpp_d = Hpp + lam * dpp[:, :, None] * jnp.eye(3)[None] + 1e-8 * jnp.eye(3)[None]
        Hpp_inv = inv3x3(Hpp_d)
        Hpp_inv = jnp.where(pt_w[:, None, None], Hpp_inv, 0.0)

        # W blocks per observation: [O, 6, 3]
        W = jnp.einsum("oki,o,okj->oij", Jc, wc, Jp)

        # Schur assembly over per-point observation lists.  Two failure
        # modes to avoid on TPU: (a) the naive per-point outer product
        # materializes [P, K, K, 6, 6], padded ~28x by tiling (12.5 GB at
        # the reference window shape); (b) scatter-adds into camera-column
        # layouts serialize per element.  Instead: per-point per-camera
        # sums via a small one-hot matmul, then the whole double sum
        #     S[a, b] = sum_p (sum_{k->a} WHinv_k)(sum_{m->b} W_m)^T
        # as one dense contraction over (p, l).
        Kmax = pt_obs.shape[1]
        W_p = W[po] * po_valid[..., None, None]                  # [P, Kmax, 6, 3]
        cam_p = jnp.clip(obs.cam_idx[po], 0, n_opt - 1)          # [P, Kmax]
        cam_is_opt = (obs.cam_idx[po] < n_opt) & po_valid
        WHinv = jnp.einsum("pkij,pjl->pkil", W_p, Hpp_inv)        # [P, Kmax, 6, 3]

        # One-hot per-point camera sums, output laid out [A, 6, 3, P]: the
        # large P axis lands in the tiled trailing position (a [P, A, 6, 3]
        # layout pads (6, 3) -> (8, 128), 56x memory traffic).
        ohk = ((cam_p[..., None] == jnp.arange(n_opt)) & cam_is_opt[..., None]
               ).astype(W.dtype)                                  # [P, K, A]
        camA = jnp.einsum("pka,pkil->ailp", ohk, WHinv)           # [A, 6, 3, P]
        camB = jnp.einsum("pka,pkil->ailp", ohk, W_p)
        S = jnp.einsum("ailp,bjlp->abij", camA, camB)             # [A, A, 6, 6]
        S_full = S.transpose(0, 2, 1, 3).reshape(n_opt * 6, n_opt * 6)

        ar = jnp.arange(n_opt)
        Hcc_blockdiag = jnp.zeros((n_opt, n_opt, 6, 6)).at[ar, ar].set(Hcc)
        Hcc_full = Hcc_blockdiag.transpose(0, 2, 1, 3).reshape(n_opt * 6, n_opt * 6)

        S_red = Hcc_full - S_full

        # rhs: gc - sum_p W Hpp^-1 gp
        rhs_acc = jnp.einsum("ailp,pl->ai", camA, gp)
        rhs = gc - rhs_acc

        S_red = S_red + 1e-8 * jnp.eye(n_opt * 6)
        # S_red is SPD (damped Schur complement of an SPD system): Cholesky
        # instead of LU — no pivoting loops on TPU.  A numerically indefinite
        # edge case yields NaN dc -> the LM candidate is simply rejected.
        dc = -jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(S_red, lower=True),
            rhs.reshape(-1)).reshape(n_opt, 6)
        # per-camera trust region: weakly-observed cameras are rank-deficient
        # and their junk updates ride along with cost-improving steps (the
        # LM gate only sees the total) — clip each camera's tangent step
        dc_norm = jnp.linalg.norm(dc, axis=1, keepdims=True)
        dc = dc * jnp.minimum(1.0, trust_region / jnp.maximum(dc_norm, 1e-9))

        # back-substitute points: dp = -Hpp^-1 (gp + W^T dc), gathered
        dc_k = dc[cam_p] * cam_is_opt[..., None]                  # [P, K, 6]
        WT_dc = jnp.einsum("pkij,pki->pj", W_p, dc_k)             # [P, 3]
        dp = -jnp.einsum("pij,pj->pi", Hpp_inv, gp + WT_dc)
        dp = jnp.where(pt_w[:, None], dp, 0.0)

        # candidate update
        new_opt = se3.pose_retract(poses7[:n_opt], dc)
        cand_poses = jnp.concatenate([new_opt, poses7[n_opt:]], axis=0)
        cand_points = points + dp
        new_cost = total_cost(cand_poses, cand_points)
        accept = new_cost < cost
        poses7 = jnp.where(accept, cand_poses, poses7)
        points = jnp.where(accept, cand_points, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9), jnp.minimum(lam * 5.0, 1e8))
        cost = jnp.where(accept, new_cost, cost)
        return (poses7, points, lam, cost), None

    state0 = (poses7, points, jnp.array(1e-4), total_cost(poses7, points))
    (poses7, points, _, _), _ = jax.lax.scan(step, state0, None, length=iters)

    r, _, _, z = _project_residuals(poses7, points, obs, K)
    chi2 = jnp.sum(r * r, axis=1) * obs.inv_sigma2
    chi2 = jnp.where(obs.valid & (z > 0), chi2, jnp.inf)
    return poses7, points, chi2
