"""Descriptor matching as batched MXU distance-matrix kernels.

TPU-native replacement for all ORBmatcher entry points
(src/vslam/src/ORBmatcher.cc).  The reference walks per-keypoint candidate
lists (grid cells / BoW nodes) with scalar L2 loops; here every matcher is one
[N, D] x [D, M] matmul on the MXU plus elementwise masks:

- squared-L2 distance via |a|^2 + |b|^2 - 2 a.b  (DescriptorDistance parity:
  ORBmatcher.cc's 4-way unrolled float loop);
- candidate gating (search windows, predicted scale ranges, epipolar bands)
  becomes an additive +inf mask on the distance matrix;
- best/second-best with jnp for the ratio test (mfNNratio);
- rotation-consistency via a 30-bin histogram keeping the top-3 bins
  (HISTO_LENGTH=30, ORBmatcher.cc:39, CheckOrientation).

Thresholds TH_HIGH=1.5 / TH_LOW=0.5 (squared L2 on unit descriptors,
ORBmatcher.cc:37-38) are passed by callers from SlamConfig.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.inf


def distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances [N, M] between descriptor rows.

    The cross term runs as a bf16-input MXU matmul with f32 accumulation —
    full systolic-array rate where f32 inputs would need multi-pass
    emulation.  Descriptors are unit-norm, so the bf16 rounding error on the
    dot (~1e-2 absolute worst case) is far below the match thresholds
    (TH_LOW=0.5 / TH_HIGH=1.5 on distances in [0, 2]); the norm terms stay
    f32."""
    af = a.astype(jnp.float32)   # inputs may ship bf16 (upload halving)
    bf = b.astype(jnp.float32)
    a2 = jnp.sum(af * af, axis=-1, keepdims=True)
    b2 = jnp.sum(bf * bf, axis=-1, keepdims=True)
    # precision=DEFAULT explicitly: the package-wide
    # jax_default_matmul_precision=highest (set for f32 geometry) would
    # otherwise force multi-pass emulation on this deliberately-bf16 dot
    ab = jnp.dot(a.astype(jnp.bfloat16), b.T.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.DEFAULT)
    return jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)


def nn_match(
    dist: jnp.ndarray,
    max_dist: float,
    ratio: float = 1.0,
    mutual: bool = False,
):
    """Row-wise nearest neighbour with Lowe ratio test.

    dist: [N, M] (masked entries = +inf).
    Returns (match_idx [N] int32, match_dist [N], valid [N] bool).
    """
    # top-2 smallest per row via two min/argmin passes — exact, and far
    # cheaper on TPU than lax.top_k's sorting network for k=2.
    bi = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(dist, bi[:, None], axis=1)[:, 0]
    cols = jnp.arange(dist.shape[1])
    masked = jnp.where(cols[None, :] == bi[:, None], INF, dist)
    second = jnp.min(masked, axis=1)
    ok = best <= max_dist
    if ratio < 1.0:
        # +inf second (no other candidate) passes the ratio test
        ok = ok & (best < ratio * ratio_guard(second))
    if mutual:
        col_best = jnp.argmin(dist, axis=0)
        ok = ok & (col_best[bi] == jnp.arange(dist.shape[0]))
    return bi.astype(jnp.int32), best, ok


def ratio_guard(x):
    return jnp.where(jnp.isfinite(x), x, 1e30)


def resolve_duplicates(match_idx, match_dist, valid, m_size: int):
    """Keep only the best row for each matched column (the reference's
    'already matched' bookkeeping, e.g. SearchForInitialization's vnMatches21).

    Returns updated valid mask."""
    # For each column, find min distance among rows matched to it.
    big = jnp.where(valid, match_dist, INF)
    col_min = jnp.full((m_size,), INF, big.dtype).at[match_idx].min(big, mode="drop")
    is_best = big <= col_min[match_idx]
    # tie-break duplicates with equal distance: keep lowest row index
    rows = jnp.arange(match_idx.shape[0])
    best_row = jnp.full((m_size,), match_idx.shape[0], jnp.int32).at[match_idx].min(
        jnp.where(is_best & valid, rows, match_idx.shape[0]).astype(jnp.int32),
        mode="drop",
    )
    return valid & is_best & (best_row[match_idx] == rows)


def rotation_consistency(
    angles_a: jnp.ndarray,
    angles_b: jnp.ndarray,
    match_idx: jnp.ndarray,
    valid: jnp.ndarray,
    histo_length: int = 30,
    keep_bins: int = 3,
):
    """Rotation-histogram filter (ORBmatcher CheckOrientation semantics):
    bin the angle differences of valid matches into `histo_length` bins and
    keep only matches in the `keep_bins` most populated bins."""
    rot = angles_a - angles_b[match_idx]
    rot = jnp.mod(rot, 2.0 * jnp.pi)
    bins = jnp.floor(rot * (histo_length / (2.0 * jnp.pi))).astype(jnp.int32)
    bins = jnp.clip(bins, 0, histo_length - 1)
    hist = jnp.zeros((histo_length,), jnp.int32).at[bins].add(valid.astype(jnp.int32))
    _, top_bins = jax.lax.top_k(hist, keep_bins)
    in_top = jnp.any(bins[:, None] == top_bins[None, :], axis=1)
    return valid & in_top


# --------------------------------------------------------------------------- #
# Matcher entry points (masks composed on the distance matrix)
# --------------------------------------------------------------------------- #
def window_mask(uv_a, uv_b, radius, valid_a=None, valid_b=None):
    """[N, M] additive mask: 0 where |uv_a_i - uv_b_j| <= radius else +inf.

    `radius` may be scalar or per-row [N] (scale-dependent search windows)."""
    d = uv_a[:, None, :] - uv_b[None, :, :]
    r = jnp.asarray(radius)
    r2 = (r * r) if r.ndim == 0 else (r * r)[:, None]
    inside = jnp.sum(d * d, axis=-1) <= r2
    if valid_a is not None:
        inside = inside & valid_a[:, None]
    if valid_b is not None:
        inside = inside & valid_b[None, :]
    return jnp.where(inside, 0.0, INF)


def epipolar_mask(F12, uv1, uv2, inv_sigma2_2, chi2_th: float = 3.84):
    """[N, M] additive mask keeping pairs whose point-to-epipolar-line distance
    in image 2 passes the chi2 gate (ORBmatcher::CheckDistEpipolarLine)."""
    h1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=1)
    h2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], axis=1)
    l2 = h1 @ F12.T                      # lines in image 2, [N, 3]
    num = (l2 @ h2.T) ** 2               # [N, M]
    den = (l2[:, 0] ** 2 + l2[:, 1] ** 2)[:, None]
    dsqr = num / jnp.clip(den, 1e-12)
    ok = dsqr * inv_sigma2_2[None, :] < chi2_th
    return jnp.where(ok, 0.0, INF)


def fundamental_from_poses(K, R1, t1, R2, t2):
    """F12 such that x2^T F12 x1 = 0 for poses T_1w, T_2w (world->cam)."""
    R12 = R2 @ R1.T
    t12 = t2 - jnp.einsum("ij,j->i", R12, t1)
    tx = jnp.array([
        [0.0, -t12[2], t12[1]],
        [t12[2], 0.0, -t12[0]],
        [-t12[1], t12[0], 0.0],
    ])
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ tx @ R12 @ Kinv


def level_mask(levels_a, levels_b, min_delta=-1, max_delta=1):
    """Scale-consistency gate: match only if level_b in
    [level_a + min_delta, level_a + max_delta] (reference's octave checks)."""
    d = levels_b[None, :] - levels_a[:, None]
    return jnp.where((d >= min_delta) & (d <= max_delta), 0.0, INF)


@functools.partial(jax.jit, static_argnames=("ratio", "histo_length", "check_rotation"))
def search_window(
    desc_a, desc_b, uv_a, uv_b, valid_a, valid_b,
    radius: float, max_dist: float, ratio: float,
    angles_a=None, angles_b=None,
    levels_a=None, levels_b=None,
    histo_length: int = 30,
    check_rotation: bool = False,
):
    """Generic windowed search: for each feature in A find the best match in B
    within `radius` pixels of uv_a (covers SearchForInitialization and the
    frame-to-frame SearchByProjection).

    Returns (match_idx [N], match_dist [N], valid [N])."""
    dist = distance_matrix(desc_a, desc_b)
    dist = dist + window_mask(uv_a, uv_b, radius, valid_a, valid_b)
    if levels_a is not None:
        dist = dist + level_mask(levels_a, levels_b)
    idx, d, ok = nn_match(dist, max_dist, ratio)
    ok = resolve_duplicates(idx, d, ok, desc_b.shape[0])
    if check_rotation and angles_a is not None:
        ok = rotation_consistency(angles_a, angles_b, idx, ok, histo_length)
    return idx, d, ok


@functools.partial(jax.jit, static_argnames=("ratio", "level_window", "use_pallas"))
def search_projection(
    desc_a, desc_b, uv_proj_a, uv_b, valid_a, valid_b,
    radius_a, max_dist: float, ratio: float,
    pred_level_a=None, levels_b=None, level_window: int = 1,
    skip_b=None, use_pallas: bool = False,
):
    """Map-point -> frame projection search (SearchByProjection overloads).

    A = projected candidates (map points / last-frame features), B = current
    frame features.  radius_a: per-candidate search radius (scale-dependent).
    skip_b: bool [M] features to exclude (already matched).
    use_pallas: route the best/second search through the fused VMEM kernel
    (ops/pallas_match.masked_nn) instead of the HBM distance matrix —
    numerics verified identical by tests/test_pallas_match.py.  Mosaic
    kernels only exist on the TPU backend, so the flag is ignored on CPU
    (the virtual-device test mesh) rather than forced through the slow
    interpreter.
    Returns (match_idx [N], dist [N], valid [N])."""
    if use_pallas and jax.default_backend() != "tpu":
        use_pallas = False
    if use_pallas:
        from asdslam_tpu.ops import pallas_match
        vb = valid_b if skip_b is None else (valid_b & ~skip_b)
        r = jnp.broadcast_to(jnp.asarray(radius_a, jnp.float32),
                             (desc_a.shape[0],))
        lw = ((-float(level_window), float(level_window))
              if pred_level_a is not None else (-1e9, 1e9))
        idx, best, second = pallas_match.masked_nn(
            desc_a, desc_b, valid_a, vb, uv_proj_a, uv_b, r * r,
            pred_level_a, levels_b, lw)
        ok = best <= max_dist
        if ratio < 1.0:
            ok = ok & (best < ratio * second)  # masked second is BIG (finite)
        ok = resolve_duplicates(idx, best, ok, desc_b.shape[0])
        return idx, best, ok
    dist = distance_matrix(desc_a, desc_b)
    dist = dist + window_mask(uv_proj_a, uv_b, radius_a, valid_a, valid_b)
    if pred_level_a is not None:
        dist = dist + level_mask(pred_level_a, levels_b, -level_window, level_window)
    if skip_b is not None:
        dist = jnp.where(skip_b[None, :], INF, dist)
    idx, d, ok = nn_match(dist, max_dist, ratio)
    ok = resolve_duplicates(idx, d, ok, desc_b.shape[0])
    return idx, d, ok


@functools.partial(jax.jit, static_argnames=("ratio",))
def search_triangulation(
    desc1, desc2, uv1, uv2, valid1, valid2, F12, inv_sigma2_2,
    max_dist: float, ratio: float = 1.0,
):
    """Epipolar-constrained matching of unmatched features between two KFs
    (ORBmatcher::SearchForTriangulation without the BoW-node gating — the MXU
    prefers the full matrix)."""
    dist = distance_matrix(desc1, desc2)
    mask = valid1[:, None] & valid2[None, :]
    dist = jnp.where(mask, dist, INF)
    dist = dist + epipolar_mask(F12, uv1, uv2, inv_sigma2_2)
    idx, d, ok = nn_match(dist, max_dist, ratio)
    ok = resolve_duplicates(idx, d, ok, desc2.shape[0])
    return idx, d, ok


@functools.partial(jax.jit, static_argnames=("ratio",))
def search_global(desc_a, desc_b, valid_a, valid_b, max_dist: float, ratio: float):
    """Unconstrained NN search with ratio test — the TPU answer to
    SearchByBoW: on the MXU a full [N, M] distance matrix is cheaper than
    maintaining BoW-node candidate lists, so the node gating is dropped."""
    dist = distance_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    dist = jnp.where(mask, dist, INF)
    idx, d, ok = nn_match(dist, max_dist, ratio)
    ok = resolve_duplicates(idx, d, ok, desc_b.shape[0])
    return idx, d, ok
