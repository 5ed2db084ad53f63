"""Image pyramid + Gaussian blur, jittable with static per-level shapes.

Mirrors ORBextractor::ComputePyramid (src/vslam/src/ORBextractor.cc:1251-1276):
n_levels levels scaled by 1/scale_factor each, bilinear resampling; descriptor
computation happens on a 7x7 sigma=2 Gaussian-blurred copy of each level
(ORBextractor.cc:1093-1097).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp


def level_shapes(h: int, w: int, n_levels: int, scale_factor: float) -> List[Tuple[int, int]]:
    shapes = []
    for i in range(n_levels):
        s = scale_factor ** i
        shapes.append((int(round(h / s)), int(round(w / s))))
    return shapes


def build_pyramid(image: jnp.ndarray, n_levels: int, scale_factor: float):
    """image [H, W] float32 -> list of [h_i, w_i] arrays (level 0 = input)."""
    h, w = image.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    levels = [image]
    for i in range(1, n_levels):
        # resize from previous level (matches the reference's cascade resize)
        levels.append(
            jax.image.resize(levels[-1], shapes[i], method="linear")
        )
    return levels


@functools.partial(jax.jit, static_argnames=("ksize",))
def gaussian_blur(image: jnp.ndarray, sigma: float = 2.0, ksize: int = 7):
    """Separable Gaussian blur, replicate padding (cv::GaussianBlur semantics
    with BORDER_REFLECT_101 approximated by edge padding)."""
    r = ksize // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    padded = jnp.pad(image, ((r, r), (0, 0)), mode="edge")
    out = jnp.zeros_like(image)
    for i in range(ksize):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(padded, i, image.shape[0], axis=0)
    padded = jnp.pad(out, ((0, 0), (r, r)), mode="edge")
    out2 = jnp.zeros_like(image)
    for i in range(ksize):
        out2 = out2 + k[i] * jax.lax.dynamic_slice_in_dim(padded, i, image.shape[1], axis=1)
    return out2
