"""Multi-chip scaling: device meshes, data-parallel descriptor inference, and
distributed bundle adjustment via Schur-complement reduction over collectives.

This is the TPU-native answer to the "distributed BA over a pod slice"
requirement (SURVEY.md §2.4, BASELINE.json config 5) — the reference has no
distributed anything, so the design is new:

- Descriptor CNN: pure data parallelism — the patch batch is sharded over the
  mesh's "data" axis; no collectives in the forward.
- Distributed BA: observations are sharded across devices.  Each device
  computes its local residuals/Jacobians and partial Gauss-Newton blocks
  (H_cc, g_c, H_pp, g_p, W); `psum` over the mesh combines them (landmark and
  camera blocks are summed over devices because observation rows are
  disjoint); the reduced camera system S (small, 6C x 6C) is solved
  REPLICATED on every device; landmark back-substitution is elementwise in
  the point blocks.  One psum round per LM iteration — communication is
  O(C^2 + P), independent of the observation count.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax.experimental.shard_map import shard_map

from asdslam_tpu.geometry import se3
from asdslam_tpu.backend import ba


def make_mesh(n_devices: int, axis: str = "data") -> Mesh:
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, (axis,))


# --------------------------------------------------------------------------- #
# Multi-host runtime (jax.distributed)
# --------------------------------------------------------------------------- #
def init_multihost(coordinator_address: str = None, num_processes: int = None,
                   process_id: int = None):
    """Initialize the jax.distributed multi-process runtime.

    On a real TPU pod slice all arguments auto-detect from the environment
    (call with no args); for CPU-simulated multi-host (tests) pass the
    coordinator explicitly.  Must be called before any other JAX use in the
    process.  This is the TPU-native replacement for an NCCL/MPI launcher —
    after it returns, `jax.devices()` is the GLOBAL device list and
    collectives ride ICI/DCN transparently."""
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def global_mesh(axis: str = "data") -> Mesh:
    """Mesh over ALL devices of the (possibly multi-process) runtime."""
    return Mesh(np.array(jax.devices()), (axis,))


def shard_to_mesh(mesh: Mesh, x, spec: P):
    """Build a globally-sharded array from identical host-local data on every
    process (each host donates the shards living on its addressable devices).
    Works single-process too (then it is just a device_put)."""
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


# --------------------------------------------------------------------------- #
# Data-parallel descriptor inference
# --------------------------------------------------------------------------- #
def dp_descriptor_fn(params, mesh: Mesh):
    """Returns a jitted descriptor fn with the patch batch sharded over the
    mesh's data axis; parameters replicated."""
    from asdslam_tpu.models import asdnet

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, P("data", None, None)),),
        out_shardings=NamedSharding(mesh, P("data", None)),
    )
    def run(patches):
        return asdnet.apply(params, patches)

    return run


# --------------------------------------------------------------------------- #
# Distributed BA (observation-sharded Schur reduction)
# --------------------------------------------------------------------------- #
def distributed_ba_step(mesh: Mesh, poses7, points, obs: ba.Obs, pt_obs_unused,
                        K, n_opt: int, lam: float = 1e-4):
    """One Gauss-Newton step of BA with observations sharded over the mesh.

    obs arrays must have leading dim divisible by mesh size.  Returns
    (new_poses7, new_points).  The Schur trick here marginalizes landmarks
    with BLOCK-JACOBI structure: H_pp is assembled globally via psum (each
    device owns disjoint observation rows), inverted replicated (batched 3x3),
    and the reduced camera system uses the distributed W^T Hpp^-1 W sum.
    """
    C = poses7.shape[0]
    Pn = points.shape[0]

    def step(poses7, points, cam_idx, pt_idx, uv, inv_s2, valid):
        obs_l = ba.Obs(cam_idx=cam_idx, pt_idx=pt_idx, uv=uv,
                       inv_sigma2=inv_s2, valid=valid)
        r, Jc, Jp, z = ba._project_residuals(poses7, points, obs_l, K)
        w = inv_s2 * valid.astype(r.dtype)
        opt = (cam_idx < n_opt)
        wc = w * opt.astype(w.dtype)

        safe_cam = jnp.clip(cam_idx, 0, n_opt - 1)
        Hcc = jnp.zeros((n_opt, 6, 6)).at[safe_cam].add(
            jnp.einsum("oki,o,okj->oij", Jc, wc, Jc), mode="drop")
        gc = jnp.zeros((n_opt, 6)).at[safe_cam].add(
            jnp.einsum("oki,o,ok->oi", Jc, wc, r), mode="drop")
        Hpp = jnp.zeros((Pn, 3, 3)).at[pt_idx].add(
            jnp.einsum("oki,o,okj->oij", Jp, w, Jp), mode="drop")
        gp = jnp.zeros((Pn, 3)).at[pt_idx].add(
            jnp.einsum("oki,o,ok->oi", Jp, w, r), mode="drop")

        # ---- collective: combine partial blocks across devices (ICI psum)
        Hcc = jax.lax.psum(Hcc, "data")
        gc = jax.lax.psum(gc, "data")
        Hpp = jax.lax.psum(Hpp, "data")
        gp = jax.lax.psum(gp, "data")

        # damping + landmark inversion (replicated)
        dcc = jnp.maximum(jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-6)
        Hcc_d = Hcc + lam * dcc[:, :, None] * jnp.eye(6)[None]
        dpp = jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6)
        Hpp_d = Hpp + lam * dpp[:, :, None] * jnp.eye(3)[None] + 1e-8 * jnp.eye(3)[None]
        Hpp_inv = jnp.linalg.inv(Hpp_d)

        # local Schur contributions: S_part = sum_o W_o Hpp^-1_p(o) W_o'^T is
        # quadratic in observations of the same point across devices; the
        # cross-device cross terms are handled by computing per-device
        # Y_o = W_o Hpp_inv and psum-ing the assembled [C, C] block matrix.
        W = jnp.einsum("oki,o,okj->oij", Jc, wc, Jp)            # [O_l, 6, 3]
        Y = jnp.einsum("oij,ojk->oik", W, Hpp_inv[pt_idx])       # [O_l, 6, 3]
        # Cross-device same-point pairs are handled by psum-ing per-point
        # per-camera aggregates, then contracting over points:
        #   S[a, b] = sum_p (sum_{o in p, cam a} Y_o)(sum_{o in p, cam b} W_o)^T
        camA = jnp.zeros((Pn, n_opt, 6, 3))
        camA = camA.at[pt_idx, safe_cam].add(Y * opt[:, None, None], mode="drop")
        camA = jax.lax.psum(camA, "data")
        camB = jnp.zeros((Pn, n_opt, 6, 3))
        camB = camB.at[pt_idx, safe_cam].add(W * opt[:, None, None], mode="drop")
        camB = jax.lax.psum(camB, "data")
        S = jnp.einsum("paij,pbkj->abik", camA, camB)            # [C, C, 6, 6]

        gp_red = jnp.einsum("paij,pj->ai", camA, gp)             # [C, 6]
        ar = jnp.arange(n_opt)
        Hcc_bd = jnp.zeros((n_opt, n_opt, 6, 6)).at[ar, ar].set(Hcc_d)
        S_red = (Hcc_bd - S).transpose(0, 2, 1, 3).reshape(n_opt * 6, n_opt * 6)
        rhs = (gc - gp_red).reshape(-1)
        S_red = S_red + 1e-8 * jnp.eye(n_opt * 6)
        dc = -jnp.linalg.solve(S_red, rhs).reshape(n_opt, 6)

        # back-substitution (needs global W^T dc per point)
        WT_dc_l = jnp.zeros((Pn, 3)).at[pt_idx].add(
            jnp.einsum("oij,oi->oj", W, dc[safe_cam] * opt[:, None]), mode="drop")
        WT_dc = jax.lax.psum(WT_dc_l, "data")
        dp = -jnp.einsum("pij,pj->pi", Hpp_inv, gp + WT_dc)

        new_opt = se3.pose_retract(poses7[:n_opt], dc)
        new_poses = jnp.concatenate([new_opt, poses7[n_opt:]], axis=0)
        return new_poses, points + dp

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)(poses7, points, obs.cam_idx, obs.pt_idx,
                            obs.uv, obs.inv_sigma2, obs.valid)
