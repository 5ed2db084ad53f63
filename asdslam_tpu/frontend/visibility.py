"""Frustum / visibility kernel — Frame::isInFrustum as a batched program
(src/vslam/src/Frame.cc:160-217).

For a camera pose and a block of map points: project, check image bounds,
depth, scale-invariance distance range, viewing angle, and predict the
pyramid level from the distance (MapPoint::PredictScale semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asdslam_tpu.geometry import se3


@functools.partial(jax.jit, static_argnames=("n_levels",))
def project_points(
    pose7, K, pos, normal, min_dist, max_dist, valid,
    width: float, height: float,
    scale_factor: float = 1.2, n_levels: int = 8,
    min_view_cos: float = 0.5,
    border: float = 0.0,
    x_min: float = 0.0, y_min: float = 0.0,
):
    """Returns (uv [M, 2], pred_level [M], view_cos [M], visible [M]).

    width/height are the MAX image bounds and x_min/y_min the MIN — for a
    distorted camera pass cfg.undistorted_bounds (the reference's
    mnMinX..mnMaxY from undistorted corners, Frame.cc:330-358); for a
    distortion-free camera the defaults give the raw image rectangle."""
    R, t = se3.pose_unpack(pose7)
    xc = jnp.einsum("ij,mj->mi", R, pos) + t
    z = xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = K[0, 0] * xc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * xc[:, 1] / zs + K[1, 2]
    uv = jnp.stack([u, v], axis=1)

    c = -R.T @ t
    pc = pos - c
    dist = jnp.linalg.norm(pc, axis=1)
    view_cos = jnp.sum(pc * normal, axis=1) / jnp.clip(dist, 1e-9)

    in_img = ((u >= x_min + border) & (u < width - border)
              & (v >= y_min + border) & (v < height - border))
    in_depth = z > 0
    in_range = (dist >= 0.8 * min_dist) & (dist <= 1.2 * max_dist)
    ok_angle = view_cos > min_view_cos

    # PredictScale: level = ceil(log(max_dist / dist) / log(scale_factor))
    ratio = jnp.clip(max_dist, 1e-9) / jnp.clip(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(jnp.clip(ratio, 1e-6)) / jnp.log(scale_factor))
    pred_level = jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)

    visible = valid & in_img & in_depth & in_range & ok_angle
    return uv, pred_level, view_cos, visible
