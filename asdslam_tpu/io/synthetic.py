"""Synthetic textured-corridor sequence renderer (device-side, jittable).

The build environment has no KITTI/EuRoC images, so end-to-end SLAM testing
uses this renderer: a box corridor (floor, ceiling, two walls) with
piecewise-constant random block textures (sharp edges -> dense FAST corners),
rendered by per-pixel ray casting from ground-truth camera poses.  Returns
images + exact trajectories, giving the ATE-style contract the reference
validates against (SURVEY.md §4) without external data.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from asdslam_tpu.geometry import se3


class Scene(NamedTuple):
    floor_y: float = 2.0
    ceil_y: float = -3.0
    left_x: float = -6.0
    right_x: float = 6.0
    back_z: float = -12.0
    front_z: float = 40.0
    tex_scale: float = 0.4     # block size in metres
    seed: int = 7


def _hash01(ix, iy, salt):
    h = (ix.astype(jnp.uint32) * jnp.uint32(73856093)
         ^ iy.astype(jnp.uint32) * jnp.uint32(19349663)
         ^ jnp.uint32(salt) * jnp.uint32(83492791))
    h = h * jnp.uint32(2654435761)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(2246822519)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0


def _plane_texture(a, b, scale, salt):
    ia = jnp.floor(a / scale).astype(jnp.int32)
    ib = jnp.floor(b / scale).astype(jnp.int32)
    v = _hash01(ia, ib, salt)
    # mix two block scales for richer structure
    ia2 = jnp.floor(a / (scale * 3.7)).astype(jnp.int32)
    ib2 = jnp.floor(b / (scale * 3.7)).astype(jnp.int32)
    v2 = _hash01(ia2, ib2, salt + 17)
    return 0.25 + 0.5 * (0.65 * v + 0.35 * v2)


@functools.partial(jax.jit, static_argnames=("height", "width", "dist"))
def render_frame(pose7, K, height: int, width: int, scene: Scene = Scene(),
                 dist: tuple = None):
    """Render one [H, W] grayscale frame from camera pose T_cw.

    dist: optional radtan (k1, k2, p1, p2) — renders the scene as seen
    through a distorting lens: pixel (u, v) carries DISTORTED normalized
    coords, so the true ray direction is their radtan inverse (what
    cv::undistortPoints would recover)."""
    R, t = se3.pose_unpack(pose7)
    c = -R.T @ t  # camera centre in world
    v, u = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                        jnp.arange(width, dtype=jnp.float32), indexing="ij")
    xn = (u - K[0, 2]) / K[0, 0]
    yn = (v - K[1, 2]) / K[1, 1]
    if dist is not None and any(abs(d) > 1e-12 for d in dist):
        from asdslam_tpu.geometry import camera as camera_mod
        cam = camera_mod.Camera.create(1.0, 1.0, 0.0, 0.0, *dist)
        und = camera_mod.undistort_normalized(
            cam, jnp.stack([xn, yn], axis=-1))
        xn, yn = und[..., 0], und[..., 1]
    d_cam = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
    d = jnp.einsum("ji,hwj->hwi", R, d_cam)  # world ray dirs (R^T d_cam)

    big = 1e9

    def plane_t(axis, value):
        denom = d[..., axis]
        tt = (value - c[axis]) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        return jnp.where(tt > 1e-3, tt, big)

    t_floor = plane_t(1, scene.floor_y)
    t_ceil = plane_t(1, scene.ceil_y)
    t_left = plane_t(0, scene.left_x)
    t_right = plane_t(0, scene.right_x)
    t_back = plane_t(2, scene.back_z)
    t_front = plane_t(2, scene.front_z)
    ts = jnp.stack([t_floor, t_ceil, t_left, t_right, t_back, t_front], axis=-1)
    which = jnp.argmin(ts, axis=-1)
    t_hit = jnp.min(ts, axis=-1)
    p = c + t_hit[..., None] * d

    tex_floor = _plane_texture(p[..., 0], p[..., 2], scene.tex_scale, 1)
    tex_ceil = _plane_texture(p[..., 0], p[..., 2], scene.tex_scale, 2)
    tex_left = _plane_texture(p[..., 1], p[..., 2], scene.tex_scale, 3)
    tex_right = _plane_texture(p[..., 1], p[..., 2], scene.tex_scale, 4)
    tex_back = _plane_texture(p[..., 0], p[..., 1], scene.tex_scale, 5)
    tex_front = _plane_texture(p[..., 0], p[..., 1], scene.tex_scale, 6)
    tex = jnp.stack([tex_floor, tex_ceil, tex_left, tex_right, tex_back, tex_front], axis=-1)
    img = jnp.take_along_axis(tex, which[..., None], axis=-1)[..., 0]
    # mild distance shading for photometric variety
    img = img * (1.0 / (1.0 + 0.015 * t_hit))
    return jnp.clip(img, 0.0, 1.0)


def make_trajectory(n_frames: int, step: float = 0.25, turn: float = 0.0):
    """Ground-truth T_cw poses moving forward along +z, optional yaw rate."""
    poses = []
    p = se3.pose_identity()
    for i in range(n_frames):
        poses.append(p)
        xi = jnp.array([0.0, turn, 0.0, 0.0, 0.0, -step])
        # T_cw(next) = exp(-motion in camera frame) * T_cw: advancing the
        # camera by `step` along its viewing axis
        p = se3.pose_retract(p, xi)
    return jnp.stack(poses)


def render_sequence(K, n_frames: int, height: int, width: int,
                    step: float = 0.25, turn: float = 0.0, scene: Scene = Scene(),
                    dist: tuple = None):
    poses = make_trajectory(n_frames, step, turn)
    frames = [render_frame(poses[i], K, height, width, scene, dist=dist)
              for i in range(n_frames)]
    return jnp.stack(frames), poses
