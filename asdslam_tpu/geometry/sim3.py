"""Batched Sim(3) operations: x -> s R x + t.

Used by loop-closure verification (Horn alignment + Sim3 refinement,
replacing src/vslam/src/Sim3Solver.cc + g2o types_seven_dof_expmap) and the
essential-graph pose optimizer (Optimizer.cc:737-1000).

Packed storage: ``[..., 8] = (qw, qx, qy, qz, tx, ty, tz, log_s)``.
Tangent: ``[..., 7] = (omega[3], upsilon[3], sigma)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from asdslam_tpu.geometry import se3

_EPS = 1e-8


def sim3_pack(s, R, t):
    q = se3.matrix_to_quat(R)
    return jnp.concatenate([q, t, jnp.log(s)[..., None]], axis=-1)


def sim3_unpack(p):
    return jnp.exp(p[..., 7]), se3.quat_to_matrix(p[..., :4]), p[..., 4:7]


def sim3_identity(shape=(), dtype=jnp.float32):
    p = jnp.zeros(shape + (8,), dtype)
    return p.at[..., 0].set(1.0)


def transform(s, R, t, x):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def compose(sa, Ra, ta, sb, Rb, tb):
    """(a o b)(x) = a(b(x)) = sa Ra (sb Rb x + tb) + ta."""
    return sa * sb, Ra @ Rb, sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def inverse(s, R, t):
    si = 1.0 / s
    Rt = jnp.swapaxes(R, -1, -2)
    return si, Rt, -si[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def _W_coeffs(sigma, theta, dtype):
    """Coefficients (A, B, C) of W = A*hat(w) + B*hat(w)^2 + C*I (Sophus-style)."""
    s = jnp.exp(sigma)
    theta2 = theta * theta
    sigma2 = sigma * sigma
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-5

    C = jnp.where(small_sigma, 1.0 + sigma / 2.0 + sigma2 / 6.0, (s - 1.0) / jnp.where(small_sigma, 1.0, sigma))

    # Case sigma small:
    A_ss = jnp.where(small_theta, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small_theta, 1.0, theta2))
    B_ss = jnp.where(small_theta, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.where(small_theta, 1.0, theta2 * theta))

    # Case sigma not small:
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = theta2 + sigma2
    safe_sigma = jnp.where(small_sigma, 1.0, sigma)
    safe_theta = jnp.where(small_theta, 1.0, theta)
    # theta small, sigma not small:
    A_ts = jnp.where(
        small_sigma, 0.0,
        ((sigma - 1.0) * s + 1.0) / (safe_sigma * safe_sigma))
    B_ts = jnp.where(
        small_sigma, 0.0,
        ((0.5 * sigma2 - sigma + 1.0) * s - 1.0) / (safe_sigma ** 3))
    # generic:
    A_gen = (a * sigma + (1.0 - b) * theta) / jnp.clip(safe_theta * c, _EPS)
    B_gen = (C - ((b - 1.0) * sigma + a * theta) / jnp.clip(c, _EPS)) / jnp.clip(theta2, _EPS)

    A = jnp.where(small_sigma, A_ss, jnp.where(small_theta, A_ts, A_gen))
    B = jnp.where(small_sigma, B_ss, jnp.where(small_theta, B_ts, B_gen))
    return A, B, C


def _W_matrix(w, sigma):
    theta = jnp.sqrt(jnp.sum(w * w, axis=-1) + _EPS * _EPS)
    A, B, C = _W_coeffs(sigma, theta, w.dtype)
    Wh = se3.hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), Wh.shape)
    return C[..., None, None] * I + A[..., None, None] * Wh + B[..., None, None] * (Wh @ Wh)


def sim3_exp(xi):
    """Tangent [..., 7] = (omega, upsilon, sigma) -> (s, R, t)."""
    w, v, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = se3.so3_exp(w)
    W = _W_matrix(w, sigma)
    t = jnp.einsum("...ij,...j->...i", W, v)
    return jnp.exp(sigma), R, t


def sim3_log(s, R, t):
    """Inverse of sim3_exp -> [..., 7]."""
    sigma = jnp.log(s)
    w = se3.so3_log(R)
    W = _W_matrix(w, sigma)
    v = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([w, v, sigma[..., None]], axis=-1)


def retract(p, xi):
    """Left-multiplicative update on packed sim3: S <- exp(xi) * S."""
    s, R, t = sim3_unpack(p)
    ds, dR, dt = sim3_exp(xi)
    sn, Rn, tn = compose(ds, dR, dt, s, R, t)
    return sim3_pack(sn, Rn, tn)
