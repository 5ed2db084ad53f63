"""Global bundle adjustment: implicit Schur complement + preconditioned CG.

Replaces Optimizer::BundleAdjustment / GlobalBundleAdjustemnt
(src/vslam/src/Optimizer.cc:43-237) at full-map scale.  The local-BA path
(backend/ba.py) assembles the reduced camera system densely, which is right
for a 16-camera window but not for thousands of keyframes; here S is never
materialized:

    S v = Hcc v - W Hpp^-1 W^T v

is evaluated per CG iteration with observation-indexed gathers/scatters
(segment-sums on the TPU), and the system is solved with block-Jacobi
preconditioned CG.  Communication-free data parallelism over observations;
the same matvec is what the distributed path psum-reduces across hosts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asdslam_tpu.geometry import se3
from asdslam_tpu.estimators.linalg import inv3x3
from asdslam_tpu.backend import ba


@functools.partial(jax.jit, static_argnames=("n_opt", "iters", "cg_iters",
                                             "huber", "trust_region"))
def global_bundle_adjust(
    poses7, points, pt_valid, obs: ba.Obs, K, n_opt: int,
    iters: int = 10, cg_iters: int = 50, huber: bool = True,
    chi2_th: float = 5.991, pt_obs=None, cam_obs=None,
    trust_region: float = ba.CAM_TRUST_REGION,
):
    """LM with implicit-Schur PCG.  First `n_opt` cameras optimized, rest
    fixed.  Returns (poses7, points, obs_chi2).

    pt_obs [P, Kp] / cam_obs [C, Kc]: optional per-point / per-camera
    observation-index tables (ba.build_pt_obs; -1 padded).  When given,
    every segment reduction runs as gather+einsum instead of a TPU
    scatter-add (which serializes per element — the dominant cost of this
    optimizer at KITTI scale).  Without them the scatter fallback keeps the
    API usable from callers that cannot precompute tables."""
    C = poses7.shape[0]
    P = points.shape[0]
    O = obs.uv.shape[0]
    delta2 = chi2_th
    obs_valid_f = obs.valid.astype(jnp.float32)
    pt_w = pt_valid

    if pt_obs is not None:
        po = jnp.clip(pt_obs, 0, O - 1)
        po_v = (pt_obs >= 0).astype(jnp.float32)

        def seg_pt(x):
            return jnp.einsum("pk...,pk->p...", x[po], po_v)
    else:
        def seg_pt(x):
            return jnp.zeros((P,) + x.shape[1:]).at[obs.pt_idx].add(
                x, mode="drop")

    if cam_obs is not None:
        co = jnp.clip(cam_obs, 0, O - 1)
        co_v = (cam_obs >= 0).astype(jnp.float32)

        def seg_cam(x):
            return jnp.einsum("ck...,ck->c...", x[co], co_v)[:n_opt]
    else:
        def seg_cam(x):
            sc = jnp.clip(obs.cam_idx, 0, n_opt - 1)
            return jnp.zeros((n_opt,) + x.shape[1:]).at[sc].add(
                x * (obs.cam_idx < n_opt).reshape(
                    (-1,) + (1,) * (x.ndim - 1)).astype(x.dtype), mode="drop")

    def total_cost(poses7, points):
        r, _, _, z = ba._project_residuals(poses7, points, obs, K)
        chi2 = jnp.sum(r * r, axis=1) * obs.inv_sigma2
        if huber:
            c = jnp.where(chi2 <= delta2, chi2,
                          2.0 * jnp.sqrt(delta2 * jnp.clip(chi2, 1e-12)) - delta2)
        else:
            c = chi2
        return jnp.sum(c * obs_valid_f)

    safe_cam = jnp.clip(obs.cam_idx, 0, n_opt - 1)
    opt_obs = (obs.cam_idx < n_opt)

    def step(state, _):
        poses7, points, lam, cost = state
        r, Jc, Jp, z = ba._project_residuals(poses7, points, obs, K)
        chi2 = jnp.sum(r * r, axis=1) * obs.inv_sigma2
        w_h = ba._huber_weight(chi2, delta2) if huber else jnp.ones_like(chi2)
        w = obs.inv_sigma2 * w_h * obs_valid_f
        wc = w * opt_obs.astype(w.dtype)

        # block diagonals (segment reductions via gather tables when given)
        Hcc = seg_cam(jnp.einsum("oki,o,okj->oij", Jc, wc, Jc))
        gc = seg_cam(jnp.einsum("oki,o,ok->oi", Jc, wc, r))
        Hpp = seg_pt(jnp.einsum("oki,o,okj->oij", Jp, w, Jp))
        gp = seg_pt(jnp.einsum("oki,o,ok->oi", Jp, w, r))

        dcc = jnp.maximum(jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-6)
        Hcc_d = Hcc + lam * dcc[:, :, None] * jnp.eye(6)[None]
        dpp = jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6)
        Hpp_d = Hpp + lam * dpp[:, :, None] * jnp.eye(3)[None] + 1e-8 * jnp.eye(3)[None]
        Hpp_inv = inv3x3(Hpp_d)
        Hpp_inv = jnp.where(pt_w[:, None, None], Hpp_inv, 0.0)

        def schur_matvec(v):
            """v: [n_opt, 6] -> S v."""
            # Hcc_d v (block diagonal)
            out = jnp.einsum("cij,cj->ci", Hcc_d, v)
            # u_o = w_o Jc_o v[cam_o] : [O, 2]
            u = jnp.einsum("oki,oi->ok", Jc, v[safe_cam]) * opt_obs[:, None]
            # a_p = sum_o Jp^T w u : [P, 3]
            a = seg_pt(jnp.einsum("oki,o,ok->oi", Jp, wc, u))
            b = jnp.einsum("pij,pj->pi", Hpp_inv, a)
            # back out: per obs Jc^T w Jp b_p, accumulate per cam
            t = jnp.einsum("oki,o,okj,oj->oi", Jc, wc, Jp, b[obs.pt_idx])
            out2 = seg_cam(t)
            return out - out2

        # rhs = gc - W Hpp^-1 gp
        hg = jnp.einsum("pij,pj->pi", Hpp_inv, gp)
        t = jnp.einsum("oki,o,okj,oj->oi", Jc, wc, Jp, hg[obs.pt_idx])
        rhs = gc - seg_cam(t)
        rhs = -rhs  # solve S dc = -rhs'

        # block-Jacobi preconditioner
        Minv = jnp.linalg.inv(Hcc_d + 1e-8 * jnp.eye(6)[None])

        def pcg(rhs):
            x0 = jnp.zeros_like(rhs)
            r0 = rhs - schur_matvec(x0)
            z0 = jnp.einsum("cij,cj->ci", Minv, r0)
            p0 = z0

            def body(carry, _):
                x, rr, zz, p = carry
                Ap = schur_matvec(p)
                rz = jnp.sum(rr * zz)
                alpha = rz / jnp.clip(jnp.sum(p * Ap), 1e-20)
                x = x + alpha * p
                r_new = rr - alpha * Ap
                z_new = jnp.einsum("cij,cj->ci", Minv, r_new)
                beta = jnp.sum(r_new * z_new) / jnp.clip(rz, 1e-20)
                p = z_new + beta * p
                return (x, r_new, z_new, p), None

            (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, z0, p0), None, length=cg_iters)
            return x

        dc = pcg(rhs)
        # per-camera trust region: a KF with 1-2 observations is
        # rank-deficient — its damped system has ~lam*1e-6 stiffness along
        # unconstrained directions, so a junk multi-thousand-unit update can
        # ride along with a cost-IMPROVING step (the LM gate only sees the
        # total).  Clip each camera's tangent step; legitimate post-
        # essential-graph corrections are far below the cap.
        # (Observed: exploded keyframe poses corrupting the final map.)
        dc_norm = jnp.linalg.norm(dc, axis=1, keepdims=True)
        dc = dc * jnp.minimum(1.0, trust_region / jnp.maximum(dc_norm, 1e-9))

        # back-substitute points: per obs  w_o Jp_o^T (Jc_o dc[cam_o])
        u_dc = jnp.einsum("oki,oi->ok", Jc, dc[safe_cam]) * opt_obs[:, None]
        WT_dc = seg_pt(jnp.einsum("okj,o,ok->oj", Jp, wc, u_dc))
        dp = -jnp.einsum("pij,pj->pi", Hpp_inv, gp + WT_dc)
        dp = jnp.where(pt_w[:, None], dp, 0.0)

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

    state0 = (poses7, points, jnp.asarray(1e-4, poses7.dtype), total_cost(poses7, points))
    (poses7, points, _, _), _ = jax.lax.scan(step, state0, None, length=iters)

    r, _, _, z = ba._project_residuals(poses7, points, obs, K)
    chi2 = jnp.sum(r * r, axis=1) * obs.inv_sigma2
    chi2 = jnp.where(obs.valid & (z > 0), chi2, jnp.inf)
    return poses7, points, chi2
