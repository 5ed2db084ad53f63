"""Pinhole camera with radtan distortion — batched, jittable.

Mirrors the reference's camera handling: intrinsics + (k1,k2,p1,p2) read from
the camera-config txt (src/read_write_data_lib/src/read_write.cpp:27-60); the
reference undistorts keypoints with cv::undistortPoints (Frame.cc:298-328) and
full images with cv::undistort (Tracking.cc:104).  Here: fixed-iteration
Newton inversion for keypoints and a bilinear-remap kernel for images.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import jax


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return Camera(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2))

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            jnp.float32,
        )


def distort_normalized(cam: Camera, xn):
    """Apply radtan to normalized coords ``xn[..., 2]``."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: Camera, xd, iters: int = 8):
    """Invert radtan by fixed-point iteration (matches cv::undistortPoints)."""
    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        xu = (xd[..., 0] - dx) / radial
        yu = (xd[..., 1] - dy) / radial
        return jnp.stack([xu, yu], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xd)


def pixel_to_normalized(cam: Camera, uv):
    return jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )


def normalized_to_pixel(cam: Camera, xn):
    return jnp.stack(
        [xn[..., 0] * cam.fx + cam.cx, xn[..., 1] * cam.fy + cam.cy], axis=-1
    )


def undistort_points(cam: Camera, uv, iters: int = 8):
    """Distorted pixel coords -> undistorted pixel coords."""
    return normalized_to_pixel(cam, undistort_normalized(cam, pixel_to_normalized(cam, uv), iters))


def project(cam: Camera, xc):
    """Camera-frame points ``xc[..., 3]`` -> pixel coords ``[..., 2]`` (no distortion:
    matching the reference, which undistorts inputs then treats the camera as ideal
    pinhole downstream)."""
    z = xc[..., 2:3]
    xn = xc[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return normalized_to_pixel(cam, xn)


def backproject(cam: Camera, uv, depth):
    """Pixel + depth -> camera-frame 3D point."""
    xn = pixel_to_normalized(cam, uv)
    return jnp.concatenate([xn * depth[..., None], depth[..., None]], axis=-1)


def undistort_image(cam: Camera, image):
    """Full-image undistortion by inverse-map bilinear sampling.

    ``image``: [H, W] float. For each output pixel, distort its normalized
    coordinate to find the source pixel in the input (same semantics as
    cv::undistort / initUndistortRectifyMap with identity new K).
    """
    H, W = image.shape
    v, u = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    uv = jnp.stack([u, v], axis=-1)
    xn = pixel_to_normalized(cam, uv)
    src = normalized_to_pixel(cam, distort_normalized(cam, xn))
    return bilinear_sample(image, src)


def bilinear_sample(image, uv):
    """Sample ``image[H, W]`` at real-valued pixel coords ``uv[..., 2]`` (u=x, v=y)."""
    H, W = image.shape
    x = jnp.clip(uv[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = x - x0.astype(x.dtype)
    wy = y - y0.astype(y.dtype)
    v00 = image[y0, x0]
    v01 = image[y0, x1]
    v10 = image[y1, x0]
    v11 = image[y1, x1]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)
