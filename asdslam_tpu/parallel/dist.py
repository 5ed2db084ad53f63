"""Multi-chip scaling: device meshes, data-parallel descriptor inference, and
distributed bundle adjustment via Schur-complement reduction over collectives.

This is the TPU-native answer to the "distributed BA over a pod slice"
requirement (SURVEY.md §2.4, BASELINE.json config 5) — the reference has no
distributed anything, so the design is new:

- Descriptor CNN: pure data parallelism — the patch batch is sharded over the
  mesh's "data" axis; no collectives in the forward.
- Distributed BA: POINT-MAJOR sharding.  Points are block-sharded over the
  mesh and every observation row lives on the device that owns its point
  (``layout_point_major`` performs the host-side re-layout).  Each device
  then holds COMPLETE landmark blocks: H_pp, g_p, the per-point camera
  aggregates and the landmark back-substitution never cross devices.  The
  only collectives are psums of the camera-side reductions — H_cc [C,6,6],
  g_c [C,6], the reduced Schur system S [C,C,6,6] and its rhs [C,6] — so
  communication per GN iteration is O(C^2), INDEPENDENT of the point and
  observation counts (the property that makes multi-host GBA viable over
  DCN; an observation-arbitrary sharding would need per-point cross-device
  aggregation, an O(P*C) payload).  The reduced camera system is solved
  replicated on every device.
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
from asdslam_tpu.estimators.linalg import inv3x3


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
# Distributed BA (point-major-sharded Schur reduction)
# --------------------------------------------------------------------------- #
def layout_point_major(points, cam_idx, pt_idx, uv, inv_sigma2, valid,
                       n_dev: int):
    """Host-side re-layout for ``distributed_ba_step_pm``: block-shard points
    over ``n_dev`` devices and group every observation onto the device that
    owns its point, with LOCAL point indices.

    Deterministic pure-numpy (identical on every host of a multi-process
    run, so each host can independently build its shards).  Returns
    (points_pad [Pn_pad, 3], cam_idx', pt_idx_local', uv', inv_sigma2',
    valid', Pn_pad) where every per-obs array has length O_pad = n_dev *
    max_per_device (padded rows have valid=False) and shard d's slice
    [d*Ol:(d+1)*Ol] contains exactly the observations of points
    [d*Pl:(d+1)*Pl], re-indexed to 0..Pl-1."""
    points = np.asarray(points, np.float32)
    cam_idx = np.asarray(cam_idx, np.int32)
    pt_idx = np.asarray(pt_idx, np.int32)
    uv = np.asarray(uv, np.float32)
    inv_sigma2 = np.asarray(inv_sigma2, np.float32)
    valid = np.asarray(valid, bool)
    Pn = len(points)
    Pl = -(-Pn // n_dev)
    Pn_pad = Pl * n_dev
    points_pad = np.zeros((Pn_pad, 3), np.float32)
    points_pad[:Pn] = points

    owner = np.clip(pt_idx, 0, Pn - 1) // Pl
    owner = np.where(valid, owner, 0)          # park invalid rows on device 0
    counts = np.bincount(owner, minlength=n_dev)
    Ol = max(int(counts.max()), 1)
    O_pad = Ol * n_dev

    def alloc(shape_tail, dtype, fill=0):
        a = np.full((O_pad,) + shape_tail, fill, dtype)
        return a

    cam_o = alloc((), np.int32)
    pt_o = alloc((), np.int32)
    uv_o = alloc((2,), np.float32)
    s2_o = alloc((), np.float32, 1)
    va_o = alloc((), bool, False)
    order = np.argsort(owner, kind="stable")
    off = np.concatenate([[0], np.cumsum(counts)])
    for d in range(n_dev):
        rows = order[off[d]:off[d + 1]]
        dst = slice(d * Ol, d * Ol + len(rows))
        cam_o[dst] = cam_idx[rows]
        pt_o[dst] = np.where(valid[rows], pt_idx[rows] - d * Pl, 0)
        uv_o[dst] = uv[rows]
        s2_o[dst] = inv_sigma2[rows]
        va_o[dst] = valid[rows]
    return points_pad, cam_o, pt_o, uv_o, s2_o, va_o, Pn_pad


@functools.lru_cache(maxsize=32)
def make_pm_step(mesh: Mesh, n_opt: int, lam: float = 1e-4):
    """Build (and cache) the jitted point-major BA step for a mesh.  The
    returned fn takes (poses7, points_pm, cam_idx, pt_idx_loc, uv, inv_s2,
    valid, K) — lowerable via ``.lower(...)`` for HLO inspection (the
    communication-payload test asserts the all-reduce sizes here are
    independent of the point count)."""

    def step(poses7, points_l, cam_idx, pt_idx, uv, inv_s2, valid, K):
        Pl = points_l.shape[0]
        # per-device: points_l [Pl, 3], obs arrays are this device's rows
        obs_l = ba.Obs(cam_idx=cam_idx, pt_idx=pt_idx, uv=uv,
                       inv_sigma2=inv_s2, valid=valid)
        r, Jc, Jp, z = ba._project_residuals(poses7, points_l, obs_l, K)
        w = inv_s2 * valid.astype(r.dtype)
        opt = (cam_idx < n_opt)
        wc = w * opt.astype(w.dtype)
        safe_cam = jnp.clip(cam_idx, 0, n_opt - 1)

        # camera blocks: partial, psum'd — O(C) payload
        Hcc = jnp.zeros((n_opt, 6, 6)).at[safe_cam].add(
            jnp.einsum("oki,o,okj->oij", Jc, wc, Jc), mode="drop")
        gc = jnp.zeros((n_opt, 6)).at[safe_cam].add(
            jnp.einsum("oki,o,ok->oi", Jc, wc, r), mode="drop")
        Hcc = jax.lax.psum(Hcc, "data")
        gc = jax.lax.psum(gc, "data")

        # landmark blocks: COMPLETE locally (every obs of a local point is
        # local by construction) — no collective
        Hpp = jnp.zeros((Pl, 3, 3)).at[pt_idx].add(
            jnp.einsum("oki,o,okj->oij", Jp, w, Jp), mode="drop")
        gp = jnp.zeros((Pl, 3)).at[pt_idx].add(
            jnp.einsum("oki,o,ok->oi", Jp, w, r), mode="drop")

        dcc = jnp.maximum(jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-6)
        Hcc_d = Hcc + lam * dcc[:, :, None] * jnp.eye(6)[None]
        dpp = jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6)
        Hpp_d = Hpp + lam * dpp[:, :, None] * jnp.eye(3)[None] + 1e-8 * jnp.eye(3)[None]
        Hpp_inv = inv3x3(Hpp_d)

        # Schur reduction: per-point per-camera aggregates are local; the
        # contraction over LOCAL points gives this device's S contribution,
        # and the psum of S [C, C, 6, 6] is the only quadratic-in-C payload
        W = jnp.einsum("oki,o,okj->oij", Jc, wc, Jp)            # [O_l, 6, 3]
        Y = jnp.einsum("oij,ojk->oik", W, Hpp_inv[pt_idx])       # [O_l, 6, 3]
        camA = jnp.zeros((Pl, n_opt, 6, 3))
        camA = camA.at[pt_idx, safe_cam].add(Y * opt[:, None, None], mode="drop")
        camB = jnp.zeros((Pl, n_opt, 6, 3))
        camB = camB.at[pt_idx, safe_cam].add(W * opt[:, None, None], mode="drop")
        S = jax.lax.psum(
            jnp.einsum("paij,pbkj->abik", camA, camB), "data")   # [C, C, 6, 6]
        gp_red = jax.lax.psum(
            jnp.einsum("paij,pj->ai", camA, gp), "data")         # [C, 6]

        ar = jnp.arange(n_opt)
        Hcc_bd = jnp.zeros((n_opt, n_opt, 6, 6)).at[ar, ar].set(Hcc_d)
        S_red = (Hcc_bd - S).transpose(0, 2, 1, 3).reshape(n_opt * 6, n_opt * 6)
        rhs = (gc - gp_red).reshape(-1)
        S_red = S_red + 1e-8 * jnp.eye(n_opt * 6)
        dc = -jnp.linalg.solve(S_red, rhs).reshape(n_opt, 6)     # replicated

        # landmark back-substitution: fully local
        WT_dc = jnp.zeros((Pl, 3)).at[pt_idx].add(
            jnp.einsum("oij,oi->oj", W, dc[safe_cam] * opt[:, None]), mode="drop")
        dp = -jnp.einsum("pij,pj->pi", Hpp_inv, gp + WT_dc)

        new_opt = se3.pose_retract(poses7[:n_opt], dc)
        new_poses = jnp.concatenate([new_opt, poses7[n_opt:]], axis=0)
        return new_poses, points_l + dp

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P("data"),
                  P("data"), P()),
        out_specs=(P(), P("data")),
        check_rep=False,
    )
    return jax.jit(sharded)


def distributed_ba_step_pm(mesh: Mesh, poses7, points_pm, cam_idx, pt_idx_loc,
                           uv, inv_s2, valid, K, n_opt: int, lam: float = 1e-4):
    """One Gauss-Newton BA step over point-major-sharded inputs (see
    ``layout_point_major``).  points_pm is sharded over the mesh's data axis;
    each obs shard references its local point slice by LOCAL index.  All
    landmark math stays device-local; the collectives are the O(C^2) camera
    reductions only.  Returns (new_poses7 replicated, new_points sharded)."""
    return make_pm_step(mesh, n_opt, lam)(poses7, points_pm, cam_idx,
                                          pt_idx_loc, uv, inv_s2, valid,
                                          jnp.asarray(K))


def distributed_ba_step(mesh: Mesh, poses7, points, obs: ba.Obs, pt_obs_unused,
                        K, n_opt: int, lam: float = 1e-4):
    """One Gauss-Newton step of BA distributed over the mesh.

    Convenience wrapper for host-addressable inputs: performs the
    point-major re-layout (``layout_point_major``) on host and runs
    ``distributed_ba_step_pm``.  Multi-process callers should do the layout
    themselves on their replicated host data and call the ``_pm`` core (see
    tests/multihost_child.py).  Returns (new_poses7, new_points) with the
    original point count."""
    n_dev = mesh.devices.size
    Pn = np.asarray(points).shape[0]
    (points_pm, cam_o, pt_o, uv_o, s2_o, va_o, Pn_pad) = layout_point_major(
        np.asarray(points), np.asarray(obs.cam_idx), np.asarray(obs.pt_idx),
        np.asarray(obs.uv), np.asarray(obs.inv_sigma2), np.asarray(obs.valid),
        n_dev)
    shd = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
    rep = lambda x: jax.device_put(np.asarray(x), NamedSharding(mesh, P()))
    new_poses, new_points = distributed_ba_step_pm(
        mesh, rep(poses7), shd(points_pm), shd(cam_o), shd(pt_o), shd(uv_o),
        shd(s2_o), shd(va_o), jnp.asarray(K), n_opt, lam)
    return new_poses, new_points[:Pn]
