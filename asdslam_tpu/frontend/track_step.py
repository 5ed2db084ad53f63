"""Fused device-resident tracking step.

The reference's per-frame hot path (src/vslam/src/Tracking.cc:213-383) is
extract -> TrackWithMotionModel (664-723, with the <20-matches widened
retry at 681-685) -> PoseOptimization -> TrackLocalMap (725-767) ->
PoseOptimization.  Round-1 ran each stage as its own kernel with host
synchronization in between (4-8 device round-trips per frame).  This module
fuses the whole path into ONE jitted program per frame, per SURVEY.md §7
("keep the whole frame step as one jitted program"):

- inputs: the raw uint8 image, previous-frame state (pose, velocity,
  features), the previous frame's map-point block (gathered on host from the
  SoA store -- a pure numpy gather, no device sync), and a fixed-capacity
  local-map candidate block;
- all data-dependent control flow (the widened-radius retry) is a
  `lax.cond`;
- outputs: the new FrameFeatures (kept on device for the next frame) plus a
  small result bundle (pose, velocity, per-feature match source codes,
  counters) fetched with a single device->host transfer.

Match bookkeeping across the host boundary uses "source codes": for current
feature f, src[f] in [0, N) means "matched to previous-frame feature src[f]"
(host resolves the map-point id via its last_mp binding), src[f] in
[N, N + P) means "matched to local-map candidate row src[f] - N", and -1
means unmatched.  The host never needs per-match device reads.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.geometry import se3
from asdslam_tpu.ops import match
from asdslam_tpu.backend import ba
from asdslam_tpu.frontend import visibility


class GeomBlock(NamedTuple):
    """Fixed-capacity block of map-point geometry gathered from the SoA store
    (a pure numpy gather on the host; uploads are asynchronous)."""

    pos: jnp.ndarray       # [P, 3]
    normal: jnp.ndarray    # [P, 3]
    min_dist: jnp.ndarray  # [P]
    max_dist: jnp.ndarray  # [P]
    valid: jnp.ndarray     # [P] bool


class PointBlock(NamedTuple):
    """GeomBlock + descriptors, for the local-map candidate stage (the motion
    stage matches against the previous frame's on-device descriptors and
    needs no map-point descriptors)."""

    pos: jnp.ndarray       # [P, 3]
    normal: jnp.ndarray    # [P, 3]
    min_dist: jnp.ndarray  # [P]
    max_dist: jnp.ndarray  # [P]
    desc: jnp.ndarray      # [P, D]
    valid: jnp.ndarray     # [P] bool


class TrackResult(NamedTuple):
    pose: jnp.ndarray       # [7] optimized T_cw
    velocity: jnp.ndarray   # [7] T_cur * T_prev^-1
    src: jnp.ndarray        # [N] int32 match source codes (inliers only)
    n_motion: jnp.ndarray   # motion-model matches found (after retry)
    n_track: jnp.ndarray    # pose-opt inliers after the motion stage
    n_inliers: jnp.ndarray  # final inliers after the local-map stage
    next_geom: GeomBlock    # per-feature matched map-point geometry — the
    #                         NEXT frame's prev_pts, kept on device so the
    #                         host uploads nothing per frame
    crow: jnp.ndarray       # [N] int32 candidate-row binding per feature
    #                         (-1 = the feature's point is not a row of the
    #                         current candidate block).  Feeding it back as
    #                         prev_crow lets the NEXT call mask already-bound
    #                         candidate rows entirely on device — the full
    #                         per-frame state recurrence (pose, velocity,
    #                         feat, geom, crow) never touches the host, which
    #                         is what makes dispatch-ahead pipelining
    #                         (tracking.py) possible.


def _scatter_codes(idx, ok, codes, n_out):
    """out[idx[a]] = codes[a] for ok rows; -1 elsewhere (duplicates already
    resolved by the matcher)."""
    safe = jnp.where(ok, idx, n_out)
    return jnp.full((n_out,), -1, jnp.int32).at[safe].set(
        codes.astype(jnp.int32), mode="drop")


def make_track_step(cfg: SlamConfig, K, extract_fn):
    """Build the fused tracking step.

    extract_fn: image [H, W] float32 -> FrameFeatures (possibly wrapped with
    undistortion).  K: [3, 3] intrinsics.
    """
    K = jnp.asarray(K, jnp.float32)
    scale_factors = jnp.asarray(cfg.scale_factors, jnp.float32)
    inv_sigma2 = jnp.asarray(cfg.inv_level_sigma2, jnp.float32)
    N = cfg.n_features
    bx0, bx1, by0, by1 = cfg.undistorted_bounds

    @jax.jit
    def track_step(img, prev_pose7, velocity7, prev_feat,
                   prev_pts: GeomBlock, cand_pts: PointBlock,
                   prev_crow=None):
        """prev_crow: optional [N] int32 — the previous call's ``crow``
        output (candidate-row binding per previous-frame feature).  The
        candidate block is refreshed only at keyframe rate; rows whose point
        a previous feature already holds are masked out of the local-map
        search, computed here from prev_crow so the host never has to sync
        to build the mask (None = no rows bound, e.g. right after a block
        rebuild, which excludes bound points by construction)."""
        if jnp.issubdtype(img.dtype, jnp.integer):
            img = img.astype(jnp.float32) * (1.0 / 255.0)
        feat = extract_fn(img)

        pred = se3.pose_retract(
            prev_pose7, se3.se3_log(*se3.pose_unpack(velocity7)))

        # ---- motion-model stage (TrackWithMotionModel) ------------------- #
        uv_p, _, _, vis_p = visibility.project_points(
            pred, K, prev_pts.pos, prev_pts.normal,
            prev_pts.min_dist, prev_pts.max_dist, prev_pts.valid,
            bx1, by1, cfg.scale_factor, cfg.n_levels, min_view_cos=-1.0,
            x_min=bx0, y_min=by0)

        lvl_radius = scale_factors[prev_feat.level]

        def run_search(radius):
            return match.search_projection(
                prev_feat.desc, feat.desc, uv_p, feat.uv_und,
                vis_p, feat.valid, radius * lvl_radius, cfg.match_th_high,
                ratio=1.0, pred_level_a=prev_feat.level, levels_b=feat.level,
                use_pallas=cfg.use_pallas_match)

        idx_n, d_n, ok_n = run_search(cfg.search_radius_motion)
        n_narrow = jnp.sum(ok_n)

        idx_m, d_m, ok_m = jax.lax.cond(
            n_narrow >= cfg.min_motion_matches,
            lambda: (idx_n, d_n, ok_n),
            lambda: run_search(cfg.search_radius_motion_wide))
        if cfg.check_orientation:
            # rotation-consistency histogram on the frame-to-frame matches
            # (ORBmatcher::CheckOrientation in SearchByProjection(cur, last))
            ok_m = match.rotation_consistency(
                prev_feat.angle, feat.angle, idx_m, ok_m,
                histo_length=cfg.histo_length)
        n_motion = jnp.sum(ok_m)

        # per-feature bindings from the motion stage
        src1 = _scatter_codes(idx_m, ok_m, jnp.arange(N), N)
        safe1 = jnp.where(ok_m, idx_m, N)
        pos_f = jnp.zeros((N, 3), jnp.float32).at[safe1].set(
            prev_pts.pos, mode="drop")
        has1 = src1 >= 0

        inv_s2_f = inv_sigma2[feat.level]
        pose1, inl1, n_track = ba.pose_only_optimize(
            pred, pos_f, feat.uv_und, inv_s2_f, has1 & feat.valid, K,
            rounds=cfg.pose_opt_rounds, iters=cfg.pose_opt_iters)
        src1 = jnp.where(inl1, src1, -1)

        # ---- local-map stage (TrackLocalMap) ----------------------------- #
        P_cand = cand_pts.pos.shape[0]
        cand_valid = cand_pts.valid
        if prev_crow is not None:
            # rows held by a previous-frame feature are bound (same semantics
            # as the former host-side isin(cand_ids, last_mp) mask)
            bound = jnp.zeros((P_cand,), bool).at[
                jnp.clip(prev_crow, 0, P_cand - 1)].max(prev_crow >= 0)
            cand_valid = cand_valid & ~bound
        uv_c, lvl_c, _, vis_c = visibility.project_points(
            pose1, K, cand_pts.pos, cand_pts.normal,
            cand_pts.min_dist, cand_pts.max_dist, cand_valid,
            bx1, by1, cfg.scale_factor, cfg.n_levels,
            x_min=bx0, y_min=by0)
        radii_c = cfg.search_radius_local * scale_factors[lvl_c]
        idx_c, d_c, ok_c = match.search_projection(
            cand_pts.desc, feat.desc, uv_c, feat.uv_und,
            vis_c, feat.valid, radii_c, cfg.match_th_high,
            ratio=0.8, pred_level_a=lvl_c, levels_b=feat.level,
            skip_b=src1 >= 0, use_pallas=cfg.use_pallas_match)

        P = cand_pts.pos.shape[0]
        src2 = _scatter_codes(idx_c, ok_c, N + jnp.arange(P), N)
        safe2 = jnp.where(ok_c, idx_c, N)
        pos_f = pos_f.at[safe2].set(cand_pts.pos, mode="drop")
        src = jnp.where(src1 >= 0, src1, src2)

        pose2, inl2, n_in = ba.pose_only_optimize(
            pose1, pos_f, feat.uv_und, inv_s2_f, (src >= 0) & feat.valid, K,
            rounds=cfg.pose_opt_rounds, iters=cfg.pose_opt_iters)
        src = jnp.where(inl2, src, -1)

        # velocity = T_cur * T_prev^-1 (Tracking.cc's mVelocity update)
        Rv, tv = se3.compose(*se3.pose_unpack(pose2),
                             *se3.inverse(*se3.pose_unpack(prev_pose7)))
        vel = se3.pose_pack(Rv, tv)

        # next frame's prev_pts, assembled ON DEVICE by gathering matched
        # map-point geometry through the src codes — the host never uploads
        # per-frame geometry blocks (critical when host->device bandwidth is
        # the bottleneck)
        P = cand_pts.pos.shape[0]
        sel_cand = src >= N

        def gather_field(prev_f, cand_f):
            from_prev = prev_f[jnp.clip(src, 0, N - 1)]
            from_cand = cand_f[jnp.clip(src - N, 0, P - 1)]
            m = sel_cand.reshape((-1,) + (1,) * (from_prev.ndim - 1))
            return jnp.where(m, from_cand, from_prev)

        next_geom = GeomBlock(
            pos=gather_field(prev_pts.pos, cand_pts.pos),
            normal=gather_field(prev_pts.normal, cand_pts.normal),
            min_dist=gather_field(prev_pts.min_dist, cand_pts.min_dist),
            max_dist=gather_field(prev_pts.max_dist, cand_pts.max_dist),
            valid=src >= 0)

        # candidate-row binding recurrence: features matched to a cand row
        # take that row; features matched to a previous feature inherit its
        # row (the point may have entered via the cand block frames ago)
        if prev_crow is None:
            inherited = jnp.full((N,), -1, jnp.int32)
        else:
            inherited = prev_crow[jnp.clip(src, 0, N - 1)]
        crow = jnp.where(src >= N, src - N,
                         jnp.where(src >= 0, inherited, -1)).astype(jnp.int32)

        res = TrackResult(pose=pose2, velocity=vel, src=src,
                          n_motion=n_motion, n_track=n_track, n_inliers=n_in,
                          next_geom=next_geom, crow=crow)
        return feat, res

    return track_step
