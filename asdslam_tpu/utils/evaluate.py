"""Trajectory evaluation: Umeyama sim3 alignment + ATE RMSE.

Implements the reference's evaluation protocol (BASELINE.md): sim3 Umeyama
alignment over all matched poses (eval_cfg.yaml `align_type: sim3,
align_num_frames: -1` in experiment_result/*), ATE = RMSE of aligned
translation error, association by nearest timestamp/frame id.
"""

from __future__ import annotations

import numpy as np


def umeyama_sim3(src: np.ndarray, dst: np.ndarray):
    """Least-squares sim3 aligning src -> dst (both [N, 3]).

    Returns (s, R, t) with dst ~ s R src + t (Umeyama 1991)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (xs ** 2).sum() / len(src)
    s = np.trace(np.diag(D) @ S) / max(var_s, 1e-12)
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_positions: np.ndarray, gt_positions: np.ndarray, align: str = "sim3"):
    """ATE RMSE after alignment. est/gt: [N, 3] associated positions."""
    if align == "sim3":
        s, R, t = umeyama_sim3(est_positions, gt_positions)
        aligned = (s * (R @ est_positions.T)).T + t
    elif align == "se3":
        s, R, t = umeyama_sim3(est_positions, gt_positions)
        aligned = (R @ est_positions.T).T + t
    else:
        aligned = est_positions
    err = aligned - gt_positions
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def associate_by_id(est, gt):
    """est, gt: dict frame_id -> position. Returns matched [N, 3] arrays."""
    common = sorted(set(est) & set(gt))
    return (np.array([est[i] for i in common]),
            np.array([gt[i] for i in common]))


def camera_centers(traj):
    """[(frame_id, pose7 T_cw)] -> dict frame_id -> camera centre."""
    from asdslam_tpu.mapping.map_store import _pose_np
    out = {}
    for fid, pose7 in traj:
        R, t = _pose_np(np.asarray(pose7))
        out[fid] = -R.T @ t
    return out
