"""Batched SE(3) / SO(3) operations in JAX.

All functions broadcast over leading batch dimensions and are jit/vmap-safe
(no data-dependent control flow; small-angle branches via jnp.where with
Taylor fallbacks).

Conventions:
- rotations as unit quaternions ``[..., 4]`` in (w, x, y, z) order, or
  matrices ``[..., 3, 3]``;
- a camera pose is T_cw (world -> camera): ``x_c = R x_w + t``;
- poses stored as ``[..., 7] = (qw, qx, qy, qz, tx, ty, tz)``;
- tangent vectors ``[..., 6] = (omega, upsilon)`` with rotation first.

Replaces the Eigen/g2o SE3Quat machinery of the reference
(src/vslam/src/Converter.cc, g2o types_six_dof_expmap) with functional
batched kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


# --------------------------------------------------------------------------- #
# Quaternions
# --------------------------------------------------------------------------- #
def quat_normalize(q):
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_multiply(a, b):
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors ``v[..., 3]`` by quaternions ``q[..., 4]``."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """Rotation matrix ``[..., 3, 3]`` -> quaternion (w,x,y,z), Shepperd-style.

    Branch-free: computes all four candidate constructions and selects the
    numerically best by the largest diagonal-based magnitude.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates (unnormalized), each valid when its pivot is largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


# --------------------------------------------------------------------------- #
# SO(3) exp / log
# --------------------------------------------------------------------------- #
def hat(w):
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    z = jnp.zeros_like(wx)
    m = jnp.stack([z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def so3_exp(w):
    """Rodrigues: tangent [..., 3] -> rotation matrix [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallback
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R):
    """Rotation matrix [..., 3, 3] -> tangent [..., 3]."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2],
         R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    sin_t = jnp.sin(theta)  # theta in [0, pi] so sin_t >= 0
    small = sin_t < 1e-6
    near_pi = jnp.logical_and(small, cos_t < 0)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0,
                      theta / jnp.clip(2.0 * sin_t, _EPS))
    w_generic = w * scale[..., None]
    # Near pi: use diagonal extraction. axis_i = sqrt((R_ii+1)/2) with signs
    # from off-diagonals.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0))
    # pick largest axis k; signs of others from R[k,j]+R[j,k]
    k = jnp.argmax(axis_abs, axis=-1)
    def sign_of(i, j):
        return jnp.sign(R[..., i, j] + R[..., j, i] + _EPS)
    s01, s02, s12 = sign_of(0, 1), sign_of(0, 2), sign_of(1, 2)
    ax0 = jnp.stack([axis_abs[..., 0], s01 * axis_abs[..., 1], s02 * axis_abs[..., 2]], axis=-1)
    ax1 = jnp.stack([s01 * axis_abs[..., 0], axis_abs[..., 1], s12 * axis_abs[..., 2]], axis=-1)
    ax2 = jnp.stack([s02 * axis_abs[..., 0], s12 * axis_abs[..., 1], axis_abs[..., 2]], axis=-1)
    axes = jnp.stack([ax0, ax1, ax2], axis=-2)
    axis = jnp.take_along_axis(axes, k[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    axis = axis / jnp.clip(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


# --------------------------------------------------------------------------- #
# SE(3)
# --------------------------------------------------------------------------- #
def se3_exp(xi):
    """Tangent [..., 6] = (omega, upsilon) -> (R [...,3,3], t [...,3])."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    W = hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = I + a[..., None, None] * W + b[..., None, None] * WW
    V = I + b[..., None, None] * W + c[..., None, None] * WW
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R, t):
    """Inverse of se3_exp -> [..., 6]."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    W = hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - a/(2b)) W^2
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - a / (2.0 * b)) / jnp.clip(theta2, _EPS),
    )
    Vinv = I - 0.5 * W + coef[..., None, None] * WW
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def compose(Ra, ta, Rb, tb):
    """(Ra,ta) o (Rb,tb): x -> Ra (Rb x + tb) + ta."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def transform(R, t, x):
    """Apply pose to points ``x[..., 3]``."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


# --------------------------------------------------------------------------- #
# Packed [7] pose <-> (R, t)
# --------------------------------------------------------------------------- #
def pose_pack(R, t):
    return jnp.concatenate([matrix_to_quat(R), t], axis=-1)


def pose_unpack(p):
    return quat_to_matrix(p[..., :4]), p[..., 4:]


def pose_identity(shape=(), dtype=jnp.float32):
    p = jnp.zeros(shape + (7,), dtype)
    return p.at[..., 0].set(1.0)


def pose_retract(p, xi):
    """Left-multiplicative update: T <- exp(xi) * T  (g2o SE3 convention)."""
    R, t = pose_unpack(p)
    dR, dt = se3_exp(xi)
    Rn, tn = compose(dR, dt, R, t)
    return pose_pack(Rn, tn)
