"""ORB-style binary descriptor as a float embedding.

Covers the reference's --use_orb path (classic 256-bit ORB,
src/vslam/src/ORBextractor.cc:111-150 computeOrbDescriptor + the
bit_pattern_31_ table at 183-441).  Two deliberate design changes:

1. The sampling pattern is GENERATED (fixed-seed Gaussian BRIEF pairs, as in
   the original BRIEF/ORB papers) rather than copying the reference's learned
   table — behaviourally equivalent spatial statistics, original data.
2. Rotation invariance comes from sampling the patch pre-rotated by the
   keypoint angle (extract_rotated_patches) instead of steering the pattern,
   which is the natural formulation for batched gathers.
3. Bits are embedded as +-1/sqrt(256) floats, so squared-L2 distance equals
   4*hamming/256 and the SAME MXU distance-matrix matchers serve both
   descriptor families.  The reference's float thresholds TH_HIGH=1.5 /
   TH_LOW=0.5 (ORBmatcher.cc:37-38) correspond to hamming 96 / 32 — right at
   stock ORB-SLAM2's 100 / 50 gates.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

ORB_DIM = 256
_PATTERN_SEED = 42


def _make_pattern(patch_size: int = 32):
    """256 Gaussian test pairs within the patch (sigma = patch/5, clipped)."""
    rng = np.random.RandomState(_PATTERN_SEED)
    half = patch_size // 2
    sigma = patch_size / 5.0
    lim = half - 3
    pts = np.clip(rng.randn(ORB_DIM, 2, 2) * sigma, -lim, lim)
    return np.round(pts + half).astype(np.int32)  # [256, 2(pair), 2(yx)]


_PATTERN = _make_pattern()


@jax.jit
def apply(patches: jnp.ndarray) -> jnp.ndarray:
    """patches [N, 32, 32] (already rotation-normalized) -> [N, 256] floats
    in {-1, +1}/16, unit L2 norm."""
    pat = jnp.asarray(_PATTERN)
    a = patches[:, pat[:, 0, 0], pat[:, 0, 1]]  # [N, 256]
    b = patches[:, pat[:, 1, 0], pat[:, 1, 1]]
    bits = (a < b).astype(jnp.float32)
    return (2.0 * bits - 1.0) / jnp.sqrt(float(ORB_DIM))


def pack_bits(desc: jnp.ndarray) -> np.ndarray:
    """Float embedding -> packed uint8 [N, 32] (for storage parity checks)."""
    bits = np.asarray(desc) > 0
    return np.packbits(bits, axis=1)
