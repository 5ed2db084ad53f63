"""ASDNet — the learned 128-float patch descriptor, in pure JAX.

Architectural parity with the reference PyTorch model
(ASDNet/ASDNet/ASDNet.py:331-370): an L2-Net/HardNet-style tower on 1x32x32
patches —

    conv3x3(1->32)    BN(affine=False) ReLU
    conv3x3(32->32)   BN ReLU
    conv3x3(32->64,s2) BN ReLU
    conv3x3(64->64)   BN ReLU
    conv3x3(64->128,s2) BN ReLU
    conv3x3(128->128) BN ReLU
    [dropout 0.3 — train only]
    conv8x8(128->128, valid) BN
    -> flatten, L2-normalize                  (Utils.py L2Norm)

with per-patch input whitening (``input_norm``: subtract mean, divide by std
of each patch; ASDNet.py:361-366).  All convs bias-free, orthogonal init with
gain 0.6 (InitWeight).

TPU-native design: NHWC layout, bfloat16 compute with float32 BN statistics
and output; the whole forward is one XLA program that the frame step fuses
into its jit.  Inference BN folds running stats into a per-channel
scale/shift.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

# (kernel_hw, in_ch, out_ch, stride)
LAYERS = [
    (3, 1, 32, 1),
    (3, 32, 32, 1),
    (3, 32, 64, 2),
    (3, 64, 64, 1),
    (3, 64, 128, 2),
    (3, 128, 128, 1),
    (8, 128, 128, 1),  # valid padding: 8x8 -> 1x1
]

DESC_DIM = 128


def _orthogonal(key, shape, gain):
    """Orthogonal init over the (fan_in, fan_out) flattening, like torch's.

    Runs on the host (numpy): init is one-time, and QR on the accelerator
    would cost a fresh XLA compilation per layer shape."""
    import numpy as np

    fan_out = shape[-1]
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= s
    n, m = max(fan_in, fan_out), min(fan_in, fan_out)
    seed = int(jax.random.key_data(key)[-1])
    a = np.random.default_rng(seed).standard_normal((n, m))
    q, r = np.linalg.qr(a)  # q: (n, m), orthonormal columns
    q = q * np.sign(np.diagonal(r))
    w = q if fan_in >= fan_out else q.T
    return jnp.asarray((gain * w).reshape(shape), jnp.float32)


def init_params(key) -> Dict[str, Any]:
    keys = jax.random.split(key, len(LAYERS))
    convs: List[jnp.ndarray] = []
    bn_mean: List[jnp.ndarray] = []
    bn_var: List[jnp.ndarray] = []
    for k, (ks, cin, cout, _s) in zip(keys, LAYERS):
        convs.append(_orthogonal(k, (ks, ks, cin, cout), gain=0.6).astype(jnp.float32))
        bn_mean.append(jnp.zeros((cout,), jnp.float32))
        bn_var.append(jnp.ones((cout,), jnp.float32))
    return {"conv": convs, "bn_mean": bn_mean, "bn_var": bn_var}


def input_norm(x):
    """Per-patch whitening over all pixels of each patch. x: [N, H, W, 1]."""
    flat = x.reshape(x.shape[0], -1)
    mean = jnp.mean(flat, axis=1)
    # torch.std uses the unbiased (n-1) estimator
    var = jnp.var(flat, axis=1) * (flat.shape[1] / (flat.shape[1] - 1))
    std = jnp.sqrt(var) + 1e-7
    return (x - mean[:, None, None, None]) / std[:, None, None, None]


def _conv(x, w, stride, padding):
    # precision=DEFAULT explicitly: the package-wide matmul_precision=highest
    # (set for f32 geometry) must not force multi-pass emulation on the
    # deliberately-bf16 conv path
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


@functools.partial(jax.jit, static_argnames=("train", "batch_stats", "compute_dtype"))
def apply(params, patches, train: bool = False, dropout_key=None,
          batch_stats: bool = False, compute_dtype=jnp.bfloat16):
    """patches: [N, 32, 32] float32 in [0, 1] -> descriptors [N, 128] float32,
    L2-normalized.

    ``train=True`` uses batch statistics for BN and applies dropout(0.3)
    before the final conv (needs ``dropout_key``).  ``batch_stats`` also
    returns the per-layer batch means/vars so a training loop can maintain
    running statistics.
    """
    x = patches[..., None].astype(jnp.float32)
    x = input_norm(x)
    x = x.astype(compute_dtype)

    new_mean, new_var = [], []
    for i, (ks, cin, cout, stride) in enumerate(LAYERS):
        pad = "VALID" if ks == 8 else "SAME"
        w = params["conv"][i].astype(compute_dtype)
        x = _conv(x, w, stride, pad)  # float32 out via preferred_element_type
        if train:
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))
            new_mean.append(mean)
            new_var.append(var)
        else:
            mean = params["bn_mean"][i]
            var = params["bn_var"][i]
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if i < len(LAYERS) - 1:
            x = jnp.maximum(x, 0.0)
        x = x.astype(compute_dtype)
        if train and i == len(LAYERS) - 2:
            keep = 0.7
            mask = jax.random.bernoulli(dropout_key, keep, x.shape)
            x = jnp.where(mask, x / keep, jnp.zeros_like(x))

    d = x.reshape(x.shape[0], -1).astype(jnp.float32)
    d = d / jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True) + 1e-10)
    if batch_stats:
        return d, (new_mean, new_var)
    return d


def update_running_stats(params, stats, momentum=0.1):
    new_mean, new_var = stats
    return {
        "conv": params["conv"],
        "bn_mean": [
            (1 - momentum) * m + momentum * bm
            for m, bm in zip(params["bn_mean"], new_mean)
        ],
        "bn_var": [
            (1 - momentum) * v + momentum * bv
            for v, bv in zip(params["bn_var"], new_var)
        ],
    }
