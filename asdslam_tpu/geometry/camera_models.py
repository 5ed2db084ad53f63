"""Extended camera/distortion models — aslam_cv2 parity, batched + jittable.

The reference vendors aslam_cv2 with pinhole + unified-projection cameras and
radtan / equidistant / fisheye distortion models
(src/aslam_cv2/aslam_cv_cameras/src/{camera-pinhole,camera-unified-projection,
distortion-radtan,distortion-equidistant,distortion-fisheye}.cc).  The SLAM
pipeline itself only uses pinhole+radtan (geometry/camera.py); these models
complete the camera library for other rigs:

- Equidistant (Kannala-Brandt): r_d = theta(1 + k1 th^2 + k2 th^4 + k3 th^6
  + k4 th^8), inverted by Newton iterations (fixed count — jit-friendly).
- Fisheye (FOV model, single parameter w): r_d = atan(2 r tan(w/2)) / w.
- Unified projection (Mei, mirror parameter xi): projects through the unit
  sphere; handles > 180-degree FOV rigs.

All functions operate on ``[..., 2]`` normalized coordinates / ``[..., 3]``
camera-frame points, matching geometry/camera.py conventions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# Equidistant (Kannala-Brandt) distortion
# --------------------------------------------------------------------------- #
class EquidistantDistortion(NamedTuple):
    k1: jnp.ndarray
    k2: jnp.ndarray
    k3: jnp.ndarray
    k4: jnp.ndarray

    @staticmethod
    def create(k1=0.0, k2=0.0, k3=0.0, k4=0.0):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return EquidistantDistortion(f(k1), f(k2), f(k3), f(k4))


def _theta_d(d: EquidistantDistortion, theta):
    t2 = theta * theta
    return theta * (1.0 + t2 * (d.k1 + t2 * (d.k2 + t2 * (d.k3 + t2 * d.k4))))


def equidistant_distort(d: EquidistantDistortion, xn):
    """Normalized pinhole coords -> distorted normalized coords."""
    r = jnp.sqrt(jnp.sum(xn * xn, axis=-1))
    theta = jnp.arctan(r)
    scale = jnp.where(r > 1e-8, _theta_d(d, theta) / jnp.maximum(r, 1e-12), 1.0)
    return xn * scale[..., None]


def equidistant_undistort(d: EquidistantDistortion, xd, iters: int = 8):
    """Invert via Newton on theta (fixed iteration count)."""
    rd = jnp.sqrt(jnp.sum(xd * xd, axis=-1))

    def body(_, theta):
        t2 = theta * theta
        f = _theta_d(d, theta) - rd
        fp = (1.0 + t2 * (3.0 * d.k1 + t2 * (5.0 * d.k2 + t2 * (
            7.0 * d.k3 + t2 * 9.0 * d.k4))))
        return theta - f / jnp.maximum(fp, 1e-6)

    theta = jax.lax.fori_loop(0, iters, body, rd)
    scale = jnp.where(rd > 1e-8, jnp.tan(theta) / jnp.maximum(rd, 1e-12), 1.0)
    return xd * scale[..., None]


# --------------------------------------------------------------------------- #
# Fisheye (FOV) distortion — aslam's single-parameter model
# --------------------------------------------------------------------------- #
class FisheyeDistortion(NamedTuple):
    w: jnp.ndarray

    @staticmethod
    def create(w=0.8):
        return FisheyeDistortion(jnp.asarray(w, jnp.float32))


def fisheye_distort(d: FisheyeDistortion, xn):
    r = jnp.sqrt(jnp.sum(xn * xn, axis=-1))
    tanwhalf = jnp.tan(d.w / 2.0)
    rd = jnp.arctan(2.0 * r * tanwhalf) / d.w
    scale = jnp.where(r > 1e-8, rd / jnp.maximum(r, 1e-12),
                      2.0 * tanwhalf / d.w)
    return xn * scale[..., None]


def fisheye_undistort(d: FisheyeDistortion, xd):
    rd = jnp.sqrt(jnp.sum(xd * xd, axis=-1))
    tanwhalf = jnp.tan(d.w / 2.0)
    r = jnp.tan(rd * d.w) / (2.0 * tanwhalf)
    scale = jnp.where(rd > 1e-8, r / jnp.maximum(rd, 1e-12),
                      d.w / (2.0 * tanwhalf))
    return xd * scale[..., None]


# --------------------------------------------------------------------------- #
# Unified projection (Mei) camera
# --------------------------------------------------------------------------- #
class UnifiedCamera(NamedTuple):
    xi: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def create(xi, fx, fy, cx, cy):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return UnifiedCamera(f(xi), f(fx), f(fy), f(cx), f(cy))


def unified_project(cam: UnifiedCamera, xc):
    """Camera-frame points [..., 3] -> pixels [..., 2] through the unit
    sphere: x / (z + xi * |x|)."""
    norm = jnp.linalg.norm(xc, axis=-1)
    denom = xc[..., 2] + cam.xi * norm
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    u = cam.fx * xc[..., 0] / denom + cam.cx
    v = cam.fy * xc[..., 1] / denom + cam.cy
    return jnp.stack([u, v], axis=-1)


def unified_backproject(cam: UnifiedCamera, uv):
    """Pixels -> unit-norm camera-frame ray [..., 3] (inverse of
    unified_project up to scale)."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    r2 = mx * mx + my * my
    # solve for z on the unit sphere: aslam's camera-unified-projection.cc
    disc = 1.0 + (1.0 - cam.xi * cam.xi) * r2
    zs = (cam.xi + jnp.sqrt(jnp.maximum(disc, 0.0))) / (1.0 + r2)
    ray = jnp.stack([zs * mx, zs * my, zs - cam.xi], axis=-1)
    return ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12)
