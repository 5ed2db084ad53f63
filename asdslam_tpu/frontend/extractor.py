"""Frame feature extraction: pyramid -> FAST -> orientation -> patches ->
descriptors, as one jitted program per image size.

TPU-native equivalent of ORBextractor::ExtractDesc
(src/vslam/src/ORBextractor.cc:1137-1248): 8-level x1.2 pyramid, per-level
FAST with cell fallback thresholds, intensity-centroid orientation, then the
ASD descriptor CNN on 32x32 patches from the Gaussian-blurred level
(computeSIFTDescriptors, ORBextractor.cc:1099-1133).  Differences by design:

- quadtree distribution -> per-cell top-k (static shapes);
- per-level descriptor batches -> one fused CNN batch over all levels;
- everything stays on device; the host sees one FrameFeatures pytree.

Per-level feature budgets follow the reference's geometric allocation
(nfeatures * (1-q)/(1-q^L) * q^level with q = 1/scale_factor).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.ops import fast, pyramid, patches


class FrameFeatures(NamedTuple):
    """Fixed-capacity per-frame feature set (capacity = cfg.n_features).

    uv:      [N, 2] keypoint positions in level-0 (full-res) pixel coords
    uv_und:  [N, 2] undistorted positions (= uv when distortion-free)
    level:   [N]    pyramid level (int32)
    angle:   [N]    orientation in radians
    score:   [N]    detector response
    desc:    [N, D] L2-normalized descriptors (float32)
    valid:   [N]    validity mask
    """

    uv: jnp.ndarray
    uv_und: jnp.ndarray
    level: jnp.ndarray
    angle: jnp.ndarray
    score: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray


def level_budgets(cfg: SlamConfig) -> List[int]:
    q = 1.0 / cfg.scale_factor
    total = cfg.n_features
    raw = [total * (1 - q) / (1 - q ** cfg.n_levels) * (q ** i) for i in range(cfg.n_levels)]
    budgets = [max(8, int(round(r))) for r in raw]
    # force exact sum
    diff = total - sum(budgets)
    budgets[0] += diff
    return budgets


def make_extractor(cfg: SlamConfig, descriptor_fn, rotate_patches: bool = False):
    """Build a jitted extractor: image [H, W] float32 in [0,1] -> FrameFeatures.

    descriptor_fn: (patches [N, 32, 32]) -> [N, D] descriptors (e.g. a closure
    over asdnet.apply with params, or the ORB binary descriptor op).
    rotate_patches: derotate patches by the keypoint angle before the
    descriptor (ORB path; ASD patches stay upright like the reference's
    computeSIFTDescriptors crop).
    """
    budgets = level_budgets(cfg)
    scales = cfg.scale_factors

    @jax.jit
    def extract(image: jnp.ndarray) -> FrameFeatures:
        levels = pyramid.build_pyramid(image, cfg.n_levels, cfg.scale_factor)
        all_uv, all_lvl, all_ang, all_score, all_valid, all_patches = [], [], [], [], [], []
        for li, img_l in enumerate(levels):
            # thresholds are on [0,1] images; the reference's 20/7 are on [0,255]
            xy, score, valid = fast.detect_level(
                img_l,
                threshold=cfg.fast_threshold / 255.0,
                min_threshold=cfg.fast_min_threshold / 255.0,
                max_keypoints=budgets[li],
                cell_size=cfg.cell_size,
                cell_cap=cfg.cell_cap,
                border=cfg.edge_margin,
            )
            ang = patches.ic_angle(img_l, xy, radius=cfg.orientation_radius)
            blurred = pyramid.gaussian_blur(img_l)
            if rotate_patches:
                pat = patches.extract_rotated_patches(
                    blurred, xy, ang, size=cfg.patch_size)
            else:
                # upright path (ASD): contiguous dynamic-slice gather — much
                # cheaper on TPU than the bilinear fancy-index gather
                pat = patches.extract_patches(blurred, xy, size=cfg.patch_size)
            all_uv.append(xy * scales[li])
            all_lvl.append(jnp.full((budgets[li],), li, jnp.int32))
            all_ang.append(ang)
            all_score.append(score)
            all_valid.append(valid)
            all_patches.append(pat)

        uv = jnp.concatenate(all_uv, axis=0)
        lvl = jnp.concatenate(all_lvl, axis=0)
        ang = jnp.concatenate(all_ang, axis=0)
        score = jnp.concatenate(all_score, axis=0)
        valid = jnp.concatenate(all_valid, axis=0)
        pat = jnp.concatenate(all_patches, axis=0)

        desc = descriptor_fn(pat)
        desc = jnp.where(valid[:, None], desc, 0.0)
        return FrameFeatures(
            uv=uv, uv_und=uv, level=lvl, angle=ang, score=score,
            desc=desc, valid=valid,
        )

    return extract


def with_undistortion(extract_fn, cam):
    """Wrap an extractor to fill uv_und via the camera model (Frame.cc:298-328)."""
    from asdslam_tpu.geometry import camera as camera_mod

    @jax.jit
    def run(image):
        f = extract_fn(image)
        und = camera_mod.undistort_points(cam, f.uv)
        return f._replace(uv_und=jnp.where(f.valid[:, None], und, f.uv))

    return run
