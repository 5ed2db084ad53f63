"""Batched local-mapping kernels: all covisible neighbours in ONE program.

The reference's LocalMapping loops over neighbour keyframes on the host —
CreateNewMapPoints matches/triangulates against up to 20 covisible KFs
(src/vslam/src/LocalMapping.cc:299-556) and SearchInNeighbors fuses with 10
neighbours in both directions (557-656), one pair at a time.  Round-1
mirrored that loop shape, costing one device round-trip per neighbour.  Here
the neighbour axis is a leading vmap axis: one jitted program evaluates every
neighbour's epipolar search + triangulation (or projection fuse) and the host
fetches all verdicts in a single transfer.  Padded neighbour slots carry
valid=False and produce no matches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asdslam_tpu.geometry import se3, triangulation
from asdslam_tpu.ops import match
from asdslam_tpu.frontend import visibility


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio", "fmean",
                                             "min_parallax_cos"))
def triangulate_neighbors(
    f1_desc, f1_uv, f1_level, f1_free,
    nb_desc, nb_uv, nb_level, nb_free,
    nb_R, nb_t, R1, t1, K, inv_sigma2_lut,
    max_dist: float, ratio: float, fmean: float,
    min_parallax_cos: float = 0.9998,
):
    """Epipolar search + midpoint triangulation of KF1 against a padded block
    of neighbour KFs (CreateNewMapPoints, LocalMapping.cc:299-556).

    f1_*: [N, ...] current keyframe features (free = valid & unmatched).
    nb_*: [Q, N, ...] stacked neighbour features; nb_R/nb_t: [Q, 3, 3]/[Q, 3].
    Returns (idx [Q, N], good [Q, N], X [Q, N, 3]) — match per f1 feature per
    neighbour, quality verdict, triangulated world point.
    """
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones_like(f1_uv[:, :1])
    xn1 = (jnp.concatenate([f1_uv, ones], 1) @ Kinv.T)[:, :2]
    c1 = -R1.T @ t1
    s2_1 = 1.0 / inv_sigma2_lut[f1_level]
    th1 = 5.991 * s2_1 / (fmean * fmean)

    def one(desc2, uv2, lvl2, free2, R2, t2):
        F12 = match.fundamental_from_poses(K, R1, t1, R2, t2)
        inv_s2_2 = inv_sigma2_lut[lvl2]
        idx, d, ok = match.search_triangulation(
            f1_desc, desc2, f1_uv, uv2, f1_free, free2, F12, inv_s2_2,
            max_dist=max_dist, ratio=ratio)
        xn2 = (jnp.concatenate([uv2[idx], ones], 1) @ Kinv.T)[:, :2]
        N = xn1.shape[0]
        X = triangulation.triangulate_midpoint(
            jnp.broadcast_to(R1, (N, 3, 3)), jnp.broadcast_to(t1, (N, 3)),
            jnp.broadcast_to(R2, (N, 3, 3)), jnp.broadcast_to(t2, (N, 3)),
            xn1, xn2)
        e1, z1 = triangulation.reprojection_error2(R1, t1, X, xn1)
        e2, z2 = triangulation.reprojection_error2(R2, t2, X, xn2)
        c2 = -R2.T @ t2
        cosp = triangulation.parallax_cos(c1, c2, X)
        s2_2 = 1.0 / inv_s2_2[idx]
        th2 = 5.991 * s2_2 / (fmean * fmean)
        good = (ok & (z1 > 0) & (z2 > 0) & (e1 < th1) & (e2 < th2)
                & (cosp < min_parallax_cos))
        # pack (idx, good) into ONE int16 array: the device->host tunnel is
        # heavily download-asymmetric (~30 MB/s with ~25 ms per-array
        # latency measured vs 1.4 GB/s up), so result bytes and array count
        # are the cost — n_features < 32768 always
        enc = jnp.where(good, idx, -1).astype(jnp.int16)
        return enc, X

    return jax.vmap(one)(nb_desc, nb_uv, nb_level, nb_free, nb_R, nb_t)


@functools.partial(jax.jit, static_argnames=("width", "height", "scale_factor",
                                             "n_levels", "fuse_radius",
                                             "max_dist"))
def fuse_pairs(
    mp_pos, mp_normal, mp_mind, mp_maxd, mp_desc, mp_valid,
    dst_pose7, dst_desc, dst_uv, dst_level, dst_valid,
    K, scale_factors, width: float, height: float,
    scale_factor: float, n_levels: int, fuse_radius: float, max_dist: float,
):
    """Projection fuse of map-point blocks into destination keyframes
    (SearchInNeighbors, LocalMapping.cc:557-656), all pairs in one program.

    mp_*: [Q, P, ...] per-pair source map-point blocks.  mp_desc may arrive
    bf16 (halved upload bytes; values re-widened here so all non-MXU math
    stays f32 — the quantization is far below the match thresholds).
    dst_*: [Q, N, ...] per-pair destination keyframe features; dst_pose7 [Q, 7].
    Returns (idx [Q, P], ok [Q, P]).
    """
    mp_desc = mp_desc.astype(jnp.float32)

    def one(pos, normal, mind, maxd, desc, valid, pose7, d_desc, d_uv,
            d_level, d_valid):
        uv, pred_level, _, vis = visibility.project_points(
            pose7, K, pos, normal, mind, maxd, valid,
            width, height, scale_factor, n_levels)
        radii = fuse_radius * scale_factors[pred_level]
        idx, d, ok = match.search_projection(
            desc, d_desc, uv, d_uv, vis, d_valid, radii, max_dist,
            ratio=1.0, pred_level_a=pred_level, levels_b=d_level)
        # single packed int16 result (see triangulate_neighbors): download
        # bytes/arrays are the dominant cost of this call over the tunnel
        return jnp.where(ok, idx, -1).astype(jnp.int16)

    return jax.vmap(one)(mp_pos, mp_normal, mp_mind, mp_maxd, mp_desc,
                         mp_valid, dst_pose7, dst_desc, dst_uv, dst_level,
                         dst_valid)
