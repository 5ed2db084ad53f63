"""Vectorized FAST-9 corner detection + NMS + grid-uniform top-k selection.

TPU-native replacement for the reference's OpenCV FAST + quadtree keypoint
distribution (src/vslam/src/ORBextractor.cc:817-1083).  Instead of the
data-dependent quadtree, spatial uniformity comes from per-cell ranking: each
~cell_size px cell contributes at most ``cell_cap`` corners before the global
score top-k, preserving the reference's uniform-coverage contract with fully
static shapes.

Score definition matches OpenCV's FAST score: the maximal threshold for which
the pixel remains a corner = max over 9-long circular arcs of the min
(brightness difference) within the arc.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, circular order, as (dy, dx).
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def fast_score(image: jnp.ndarray, arc_length: int = 9) -> jnp.ndarray:
    """Per-pixel FAST-9 corner score (0 at non-corners is NOT enforced here;
    threshold separately).  image: [H, W] float32.  Returns [H, W] score."""
    H, W = image.shape
    pad = 3
    padded = jnp.pad(image, pad, mode="edge")
    # circle differences: d[i] = I(p + o_i) - I(p), each [H, W]
    diffs = jnp.stack(
        [
            jax.lax.dynamic_slice(padded, (pad + dy, pad + dx), (H, W)) - image
            for (dy, dx) in _CIRCLE
        ],
        axis=0,
    )  # [16, H, W]

    def window_min(d, n):
        # Circular sliding-window min of length n along axis 0, by doubling:
        # after combining with a roll of the current window size, `mins[i]`
        # covers 2x entries; a final overlapping roll covers the remainder
        # (overlap is harmless for min).
        mins = d
        size = 1
        while size * 2 <= n:
            mins = jnp.minimum(mins, jnp.roll(mins, -size, axis=0))
            size *= 2
        if size < n:
            mins = jnp.minimum(mins, jnp.roll(mins, -(n - size), axis=0))
        return mins

    bright = window_min(diffs, arc_length)           # min of d over arc
    dark = window_min(-diffs, arc_length)            # min of -d over arc
    bright_score = jnp.max(bright, axis=0)
    dark_score = jnp.max(dark, axis=0)
    return jnp.maximum(bright_score, dark_score)


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression.  Ties on plateaus are broken by raster order:
    strict > against earlier neighbours, >= against later ones, so exactly one
    pixel of a tied plateau survives."""
    padded = jnp.pad(score, 1, mode="constant", constant_values=-jnp.inf)
    H, W = score.shape
    keep = jnp.ones_like(score, dtype=bool)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            n = jax.lax.dynamic_slice(padded, (dy, dx), (H, W))
            earlier = (dy < 1) or (dy == 1 and dx < 1)
            keep = keep & ((score > n) if earlier else (score >= n))
    return jnp.where(keep, score, 0.0)


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "cell_size", "cell_cap", "border")
)
def detect_level(
    image: jnp.ndarray,
    threshold: float,
    min_threshold: float,
    max_keypoints: int,
    cell_size: int = 30,
    cell_cap: int = 4,
    border: int = 16,
):
    """Detect up to ``max_keypoints`` FAST corners on one pyramid level.

    Returns (xy [K, 2] float32 (x, y) in level coords, score [K], valid [K]).

    Cells with no corner above ``threshold`` fall back to ``min_threshold``
    (reference: iniThFAST=20 -> minThFAST=7, ORBextractor.cc:817-864).  Spatial
    uniformity: each cell contributes at most ``cell_cap`` corners (replaces the
    quadtree of DistributeOctTree with a static-shape equivalent).
    """
    H, W = image.shape
    score = fast_score(image)
    score = nms3(score)

    # border mask
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    in_border = (
        (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    )
    score = jnp.where(in_border, score, 0.0)

    hi = score > threshold
    lo = score > min_threshold

    # Pad to a multiple of cell_size for cell processing.
    ncy = -(-H // cell_size)
    ncx = -(-W // cell_size)
    ph, pw = ncy * cell_size, ncx * cell_size
    s_pad = jnp.zeros((ph, pw), score.dtype).at[:H, :W].set(score)
    hi_pad = jnp.zeros((ph, pw), bool).at[:H, :W].set(hi)
    lo_pad = jnp.zeros((ph, pw), bool).at[:H, :W].set(lo)

    cells_s = s_pad.reshape(ncy, cell_size, ncx, cell_size).transpose(0, 2, 1, 3).reshape(ncy * ncx, cell_size * cell_size)
    cells_hi = hi_pad.reshape(ncy, cell_size, ncx, cell_size).transpose(0, 2, 1, 3).reshape(ncy * ncx, cell_size * cell_size)
    cells_lo = lo_pad.reshape(ncy, cell_size, ncx, cell_size).transpose(0, 2, 1, 3).reshape(ncy * ncx, cell_size * cell_size)

    # Per-cell: use hi-threshold corners; if the cell has none, fall back to lo.
    cell_has_hi = jnp.any(cells_hi, axis=1, keepdims=True)
    use = jnp.where(cell_has_hi, cells_hi, cells_lo)
    cell_scores = jnp.where(use, cells_s, 0.0)

    # Per-cell top-`cell_cap` by score: `cell_cap` max/argmax+mask passes —
    # exact, and cheaper on TPU than a per-cell sort for small caps.
    cap_list_s, cap_list_i = [], []
    work = cell_scores
    ccols = jnp.arange(work.shape[1])
    for _ in range(cell_cap):
        ci = jnp.argmax(work, axis=1).astype(jnp.int32)
        cs = jnp.take_along_axis(work, ci[:, None], axis=1)[:, 0]
        cap_list_s.append(cs)
        cap_list_i.append(ci)
        work = jnp.where(ccols[None, :] == ci[:, None], -jnp.inf, work)
    cap_scores = jnp.stack(cap_list_s, axis=1)  # [C, cap]
    cap_idx = jnp.stack(cap_list_i, axis=1)

    # Recover global (y, x) from cell index + intra-cell index.
    cell_ids = jnp.arange(ncy * ncx)[:, None]
    cy = cell_ids // ncx
    cx = cell_ids % ncx
    iy = cap_idx // cell_size
    ix = cap_idx % cell_size
    gy = cy * cell_size + iy
    gx = cx * cell_size + ix

    flat_scores = cap_scores.reshape(-1)
    flat_y = gy.reshape(-1)
    flat_x = gx.reshape(-1)

    # Global top-k over the per-cell survivors.
    k = min(max_keypoints, flat_scores.shape[0])
    top_scores, top_i = jax.lax.top_k(flat_scores, k)
    sel_y = flat_y[top_i]
    sel_x = flat_x[top_i]
    valid = top_scores > 0.0

    xy = jnp.stack([sel_x, sel_y], axis=-1).astype(jnp.float32)
    if k < max_keypoints:
        padk = max_keypoints - k
        xy = jnp.concatenate([xy, jnp.zeros((padk, 2), jnp.float32)], axis=0)
        top_scores = jnp.concatenate([top_scores, jnp.zeros((padk,), top_scores.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((padk,), bool)], axis=0)
    return xy, top_scores, valid
