"""Keypoint-centred patch gathers: orientation (intensity centroid) and
descriptor patch extraction.

Replaces IC_Angle (src/vslam/src/ORBextractor.cc:80-107) and the 32x32 patch
crop feeding the descriptor CNN (ORBextractor.cc:1099-1133).  Gathers are
batched over keypoints with vmap'd dynamic slices — static patch sizes, no
data-dependent shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_patches(image: jnp.ndarray, xy: jnp.ndarray, size: int):
    """Gather [K, size, size] patches centred at integer keypoints xy (x, y).

    Keypoints are clamped so patches stay in-bounds (callers mask border
    keypoints out separately)."""
    H, W = image.shape
    half = size // 2
    x0 = jnp.clip(xy[:, 0].astype(jnp.int32) - half, 0, W - size)
    y0 = jnp.clip(xy[:, 1].astype(jnp.int32) - half, 0, H - size)

    def one(y, x):
        return jax.lax.dynamic_slice(image, (y, x), (size, size))

    return jax.vmap(one)(y0, x0)


@functools.partial(jax.jit, static_argnames=("radius",))
def ic_angle(image: jnp.ndarray, xy: jnp.ndarray, radius: int = 15):
    """Intensity-centroid orientation, circular patch of given radius.

    Returns angles in radians [K].  Mirrors IC_Angle: m10 = sum x*I,
    m01 = sum y*I over the circular patch; angle = atan2(m01, m10).
    """
    size = 2 * radius + 1
    patches = _gather_patches(image, xy, size)  # [K, size, size]
    coords = jnp.arange(size, dtype=jnp.float32) - radius
    yy = coords[:, None]
    xx = coords[None, :]
    circ = (yy * yy + xx * xx) <= (radius * radius)
    w = jnp.where(circ, 1.0, 0.0)
    m10 = jnp.sum(patches * (xx * w), axis=(1, 2))
    m01 = jnp.sum(patches * (yy * w), axis=(1, 2))
    return jnp.arctan2(m01, m10)


@functools.partial(jax.jit, static_argnames=("size",))
def extract_patches(image: jnp.ndarray, xy: jnp.ndarray, size: int = 32):
    """[K, size, size] intensity patches for the descriptor network, already
    /255-normalized upstream (image is float in [0,1])."""
    return _gather_patches(image, xy, size)


@functools.partial(jax.jit, static_argnames=("size",))
def extract_rotated_patches(image: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray, size: int = 32):
    """Rotation-normalized patches: sample a size x size grid rotated by the
    keypoint angle (bilinear).  Used when descriptor rotation invariance is
    handled by patch derotation rather than by the network."""
    half = (size - 1) / 2.0
    coords = jnp.arange(size, dtype=jnp.float32) - half
    gy, gx = jnp.meshgrid(coords, coords, indexing="ij")
    ca = jnp.cos(angles)[:, None, None]
    sa = jnp.sin(angles)[:, None, None]
    # rotate sampling grid by angle
    sx = ca * gx[None] - sa * gy[None] + xy[:, 0][:, None, None]
    sy = sa * gx[None] + ca * gy[None] + xy[:, 1][:, None, None]
    H, W = image.shape
    sx = jnp.clip(sx, 0.0, W - 1.000001)
    sy = jnp.clip(sy, 0.0, H - 1.000001)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = sx - x0
    wy = sy - y0
    v00 = image[y0, x0]
    v01 = image[y0, x1]
    v10 = image[y1, x0]
    v11 = image[y1, x1]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)
