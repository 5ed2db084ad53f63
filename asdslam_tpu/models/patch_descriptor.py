"""Deterministic classical patch descriptor (no learned weights).

Normalized, blurred, downsampled patch intensities -> 128-d unit vector.
Used for pipeline bring-up and tests where the ASDNet weights are untrained;
plugs into the same descriptor_fn slot as asdnet.apply.  (The reference has
an analogous classical fallback: its --use_orb path,
src/vslam/src/ORBextractor.cc ExtractDesc dispatch.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def apply(patches: jnp.ndarray) -> jnp.ndarray:
    """patches [N, 32, 32] float -> [N, 128] L2-normalized descriptors.

    Average-pool 32x32 -> 16x8 (2x4 pools), whiten per patch, L2-normalize.
    Rectangular pooling keeps some vertical detail while fitting 128 dims.
    """
    x = patches
    n = x.shape[0]
    # 32x32 -> 16x8: pool 2 rows x 4 cols
    x = x.reshape(n, 16, 2, 8, 4).mean(axis=(2, 4))
    x = x.reshape(n, 128)
    x = x - jnp.mean(x, axis=1, keepdims=True)
    x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-8)
    return x
