"""ASDNet training: adaptive-scale triplet loss with in-batch hardest-negative
mining, TPU-native (jit + optional data-parallel sharding).

Behavioural parity with the reference trainer (ASDNet/ASDNet/ASDNet.py):

- `l2_distance_matrix_sqrt` — pairwise L2 distances between anchor/positive
  descriptor batches (L2DisMetrix, ASDNet.py:45-53)
- hardest in-batch negative per anchor, excluding the diagonal and
  near-duplicates (< 0.008 distance masked out, ASDNet.py:62-66), with
  optional anchor swap (min over both directions)
- epochs <= 8: the "adaptive_scale" log-sigmoid loss with batch-derived
  theta = mean(min_neg + pos), alpha = mean(min_neg)/mean(pos)
  (ASDNet.py:78-83); later epochs: plain triplet margin 1.0 (:84-85)
- CorrelationPenaltyLoss on anchors (:31-42) and global orthogonal
  regularization (:92-98) as optional terms
- SGD lr=10 decayed linearly to 0 over the epoch budget (:539-561),
  batch 1024, 17 epochs

The reference trains on UBC PhotoTour (not available offline); `make_batch`
renders matched patch pairs from the synthetic scene generator instead, and
`fpr95` implements the reference's eval metric (ErrorRateAt95Recall,
ASDNet.py:106-113).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from asdslam_tpu.models import asdnet


def l2_distance_matrix_sqrt(a, b, eps=1e-6):
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.sqrt(jnp.maximum(a2 + b2 - 2 * ab, 0.0) + eps)


def asd_loss(out_a, out_p, adaptive: bool, margin: float = 1.0,
             anchor_swap: bool = True):
    """loss_ASDNet parity (ASDNet.py:56-90)."""
    n = out_a.shape[0]
    d = l2_distance_matrix_sqrt(out_a, out_p) + 1e-8
    pos = jnp.diagonal(d)
    off = d + jnp.eye(n) * 10.0
    # mask near-duplicate negatives (distance < 0.008)
    off = off + jnp.where(off < 0.008, 10.0, 0.0)
    min_neg = jnp.min(off, axis=1)
    if anchor_swap:
        min_neg = jnp.minimum(min_neg, jnp.min(off, axis=0))

    if adaptive:
        theta = jnp.mean(min_neg + pos)
        alpha = jnp.mean(min_neg) / jnp.clip(jnp.mean(pos), 1e-8)
        right = jax.nn.log_sigmoid(alpha * (theta - pos))
        nege = jax.nn.log_sigmoid(alpha * (min_neg - theta))
        loss = -(right + nege) / jnp.clip(alpha, 1e-8)
    else:
        loss = jnp.maximum(margin + pos - min_neg, 0.0)
    return jnp.mean(loss)


def correlation_penalty(x):
    """CorrelationPenaltyLoss parity (ASDNet.py:31-42)."""
    z = x - jnp.mean(x, axis=0)
    cor = z.T @ z
    off = cor - jnp.diag(jnp.diagonal(cor))
    return jnp.sqrt(jnp.sum(off * off) + 1e-12) / x.shape[0]


def global_orthogonal_regularization(anchor, negative):
    """GOR parity (ASDNet.py:92-98)."""
    nd = jnp.sum(anchor * negative, axis=1)
    dim = anchor.shape[1]
    return jnp.mean(nd) ** 2 + jnp.maximum(jnp.mean(nd ** 2) - 1.0 / dim, 0.0)


def augment_pair(key, a, p):
    """Geometric augmentation of matched patch pairs — flip / rot90 /
    random-resized-crop, the reference's TripletPhotoTour pipeline
    (ASDNet.py:234-329).  The same transform is applied to BOTH members so
    correspondence is preserved."""
    B, S, _ = a.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rots = jax.random.randint(k1, (B,), 0, 4)
    flips = jax.random.bernoulli(k2, 0.5, (B,))

    def rot_flip(img, r, f):
        img = jax.lax.switch(r, [
            lambda x: x,
            lambda x: jnp.rot90(x, 1),
            lambda x: jnp.rot90(x, 2),
            lambda x: jnp.rot90(x, 3),
        ], img)
        return jnp.where(f, img[:, ::-1], img)

    a = jax.vmap(rot_flip)(a, rots, flips)
    p = jax.vmap(rot_flip)(p, rots, flips)

    # RandomResizedCrop: sample a scale in [0.7, 1.0] and a centre jitter,
    # bilinear-resample back to SxS
    scl = jax.random.uniform(k3, (B,), minval=0.7, maxval=1.0)
    ctr = jax.random.uniform(k4, (B, 2), minval=-2.0, maxval=2.0)

    def crop_resize(img, s, c):
        half = (S - 1) / 2.0
        coords = (jnp.arange(S, dtype=jnp.float32) - half) * s
        gy = coords[:, None] + half + c[0]
        gx = coords[None, :] + half + c[1]
        gy = jnp.clip(gy, 0.0, S - 1.001)
        gx = jnp.clip(gx, 0.0, S - 1.001)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, S - 1)
        x1 = jnp.minimum(x0 + 1, S - 1)
        wy, wx = gy - y0, gx - x0
        return (img[y0, x0] * (1 - wy) * (1 - wx) + img[y0, x1] * (1 - wy) * wx
                + img[y1, x0] * wy * (1 - wx) + img[y1, x1] * wy * wx)

    a = jax.vmap(crop_resize)(a, scl, ctr)
    p = jax.vmap(crop_resize)(p, scl, ctr)
    return a, p


@functools.partial(jax.jit, static_argnames=("adaptive", "decor", "gor", "augment"))
def train_step(params, opt_state, batch_a, batch_p, key, lr,
               adaptive: bool = True, decor: bool = True, gor: bool = True,
               augment: bool = True):
    """One SGD step on a batch of matched patch pairs [B, 32, 32] x2."""

    def loss_fn(p):
        ka, kp, kaug = jax.random.split(key, 3)
        ba, bp = (augment_pair(kaug, batch_a, batch_p)
                  if augment else (batch_a, batch_p))
        # f32 compute for training: the bf16 conv's transpose rule rejects the
        # f32 cotangent produced by preferred_element_type
        out_a, stats = asdnet.apply(p, ba, train=True, dropout_key=ka,
                                    batch_stats=True, compute_dtype=jnp.float32)
        out_p = asdnet.apply(p, bp, train=True, dropout_key=kp,
                             compute_dtype=jnp.float32)
        loss = asd_loss(out_a, out_p, adaptive=adaptive)
        if decor:
            loss = loss + correlation_penalty(out_a)
        if gor:
            # global orthogonal regularization against random (non-matching)
            # descriptors — ASDNet.py:92-98, weighted as in the reference
            loss = loss + global_orthogonal_regularization(
                out_a, jnp.roll(out_p, 1, axis=0))
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    # SGD with per-step lr (reference: lr=10 linearly decayed, wd 1e-4)
    new_conv = [c - lr * (g + 1e-4 * c) for c, g in zip(params["conv"], grads["conv"])]
    params = {"conv": new_conv, "bn_mean": params["bn_mean"], "bn_var": params["bn_var"]}
    params = asdnet.update_running_stats(params, stats)
    return params, opt_state, loss


def lr_schedule(step, total_steps, base_lr=10.0):
    """Linear decay to 0 (ASDNet.py:539-548)."""
    return base_lr * jnp.maximum(0.0, 1.0 - step / total_steps)


def fpr95(dists_pos, dists_neg):
    """FPR at 95% recall (ErrorRateAt95Recall semantics, ASDNet.py:106-113)."""
    d = np.concatenate([np.asarray(dists_pos), np.asarray(dists_neg)])
    labels = np.concatenate([np.ones(len(dists_pos)), np.zeros(len(dists_neg))])
    order = np.argsort(d)
    labels = labels[order]
    cum = np.cumsum(labels)
    idx = int(np.argmax(cum >= 0.95 * labels.sum()))
    fp = np.sum(labels[:idx] == 0)
    tn = np.sum(labels[idx:] == 0)
    return float(fp) / max(float(fp + tn), 1.0)


# --------------------------------------------------------------------------- #
# Synthetic patch-pair source (PhotoTour is not available offline)
# --------------------------------------------------------------------------- #
def make_batch(key, batch_size: int, size: int = 32):
    """Matched patch pairs from the procedural texture world: a patch and a
    warped (shifted/rotated/scaled + noise) view of the same surface region."""
    from asdslam_tpu.io import synthetic as synth

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # base "surface": big textured canvas sampled at random windows
    H = W = 256
    u = jax.random.uniform(k1, (batch_size, 2), minval=40.0, maxval=H - 40.0)
    canvas_ids = jax.random.randint(k2, (batch_size,), 0, 4)

    canvas = jnp.stack([
        synth._plane_texture(
            jnp.tile(jnp.arange(W, dtype=jnp.float32)[None, :], (H, 1)) * 0.1,
            jnp.tile(jnp.arange(H, dtype=jnp.float32)[:, None], (1, W)) * 0.1,
            1.3, i) for i in range(4)
    ])  # [4, H, W]

    from asdslam_tpu.ops import patches as patches_mod

    def crop(c_id, uv, angle, scale, noise_key):
        img = canvas[c_id]
        half = (size - 1) / 2.0
        coords = (jnp.arange(size, dtype=jnp.float32) - half) * scale
        gy, gx = jnp.meshgrid(coords, coords, indexing="ij")
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        sx = ca * gx - sa * gy + uv[0]
        sy = sa * gx + ca * gy + uv[1]
        sx = jnp.clip(sx, 0.0, W - 1.001)
        sy = jnp.clip(sy, 0.0, H - 1.001)
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        wx, wy = sx - x0, sy - y0
        v = (img[y0, x0] * (1 - wx) * (1 - wy) + img[y0, x1] * wx * (1 - wy)
             + img[y1, x0] * (1 - wx) * wy + img[y1, x1] * wx * wy)
        return v + 0.02 * jax.random.normal(noise_key, v.shape)

    zeros = jnp.zeros(batch_size)
    ones = jnp.ones(batch_size)
    nk = jax.random.split(k3, batch_size)
    anchors = jax.vmap(crop)(canvas_ids, u, zeros, ones, nk)
    # positive: same spot, perturbed view
    ang = jax.random.uniform(k4, (batch_size,), minval=-0.4, maxval=0.4)
    scl = jax.random.uniform(k5, (batch_size,), minval=0.8, maxval=1.25)
    jitter = jax.random.normal(jax.random.fold_in(k4, 1), (batch_size, 2)) * 1.0
    nk2 = jax.random.split(jax.random.fold_in(k3, 1), batch_size)
    positives = jax.vmap(crop)(canvas_ids, u + jitter, ang, scl, nk2)
    return anchors, positives


# --------------------------------------------------------------------------- #
# UBC PhotoTour (the reference's training set, ASDNet.py:119-195) — raw
# layout loader, used when the dataset is present locally (no network).
# --------------------------------------------------------------------------- #
def _load_bmp_gray(path: str) -> np.ndarray:
    """Minimal 8-bit (grayscale-palette) BMP decoder for PhotoTour tiles."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] != b"BM":
        raise ValueError("not a BMP: %s" % path)
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    if bpp != 8:
        raise ValueError("PhotoTour BMPs are 8-bit, got %d bpp" % bpp)
    stride = (w + 3) & ~3
    rows = np.frombuffer(buf, np.uint8, stride * abs(h), off)
    img = rows.reshape(abs(h), stride)[:, :w]
    if h > 0:  # bottom-up storage
        img = img[::-1]
    return img.astype(np.float32) / 255.0


def load_phototour(root: str, max_patches: int = None):
    """Load a PhotoTour sequence dir (liberty/notredame/yosemite): patches
    from the 16x16 grids of 64x64 in patches*.bmp, 3D-point ids from
    info.txt.  Returns (patches [N, 64, 64] float32, ids [N] int64)."""
    import glob
    import os

    ids = np.loadtxt(os.path.join(root, "info.txt"), dtype=np.int64,
                     usecols=(0,))
    n = len(ids) if max_patches is None else min(len(ids), max_patches)
    out = np.zeros((n, 64, 64), np.float32)
    i = 0
    for bmp in sorted(glob.glob(os.path.join(root, "patches*.bmp"))):
        if i >= n:
            break
        tile = _load_bmp_gray(bmp)
        gh, gw = tile.shape[0] // 64, tile.shape[1] // 64
        for r in range(gh):
            for c in range(gw):
                if i >= n:
                    break
                out[i] = tile[r * 64:(r + 1) * 64, c * 64:(c + 1) * 64]
                i += 1
    return out[:i], ids[:i]


def read_phototour_pairs(root: str, name: str = "m50_100000_100000_0.txt"):
    """The 100k eval pair list: returns (idx1 [M], idx2 [M], is_match [M]) —
    the FPR@95 protocol of the reference (ASDNet.py:503-537)."""
    import os

    tbl = np.loadtxt(os.path.join(root, name), dtype=np.int64)
    return tbl[:, 0], tbl[:, 3], tbl[:, 1] == tbl[:, 4]


def phototour_batch(key, patches: np.ndarray, ids: np.ndarray,
                    batch_size: int, size: int = 32):
    """Sample matched (anchor, positive) pairs: two different patches of the
    same 3D point, centre-cropped 64->size (TripletPhotoTour semantics)."""
    uniq, first = np.unique(ids, return_index=True)
    # precompute, per 3D point, the first two patch indices
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    starts = np.searchsorted(sorted_ids, uniq)
    counts = np.searchsorted(sorted_ids, uniq, side="right") - starts
    multi = counts >= 2
    pts = np.nonzero(multi)[0]
    sel = np.asarray(jax.random.randint(key, (batch_size,), 0, len(pts)))
    lo = (64 - size) // 2
    a_idx = order[starts[pts[sel]]]
    p_idx = order[starts[pts[sel]] + 1]
    a = patches[a_idx][:, lo:lo + size, lo:lo + size]
    p = patches[p_idx][:, lo:lo + size, lo:lo + size]
    return jnp.asarray(a), jnp.asarray(p)


def train_asdnet(key, n_steps: int = 200, batch_size: int = 256,
                 adaptive_until: int = None, base_lr: float = 0.5):
    """Small-scale training driver (synthetic pairs).  Returns params.

    Note: the reference's lr=10 is tuned for batch 1024 on PhotoTour with
    5M pairs/epoch; for the synthetic source a smaller lr is stable.
    """
    params = asdnet.init_params(key)
    adaptive_until = adaptive_until if adaptive_until is not None else n_steps // 2
    opt_state = None
    for step in range(n_steps):
        key, kb, ks = jax.random.split(key, 3)
        a, p = make_batch(kb, batch_size)
        lr = float(lr_schedule(step, n_steps, base_lr))
        params, opt_state, loss = train_step(
            params, opt_state, a, p, ks, lr, adaptive=step < adaptive_until)
    return params


def evaluate_fpr95(params, key, n_pairs: int = 512):
    a, p = make_batch(key, n_pairs)
    da = asdnet.apply(params, a)
    dp = asdnet.apply(params, p)
    pos = jnp.linalg.norm(da - dp, axis=1)
    neg = jnp.linalg.norm(da - jnp.roll(dp, 1, axis=0), axis=1)
    return fpr95(pos, neg)
