"""Small-matrix numerical primitives that avoid eigh/svd on TPU.

TPU f32 `jnp.linalg.eigh`/`svd` are extremely slow to compile through the
Mosaic/XLA path and imprecise for our needs, so RANSAC model solving uses:

- `null_vector`: smallest right-singular vector of A via inverse power
  iteration on A^T A + eps I (batched LU solves, which XLA compiles quickly);
- `svd3`: full 3x3 SVD assembled from power/inverse-power iterations on
  A^T A — enough accuracy for essential-matrix and homography decomposition.

These replace the per-hypothesis cv::SVD calls inside the reference's
Initializer (src/vslam/src/Initializer.cc ComputeH21/ComputeF21/Decompose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(v):
    return v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def inv3x3(A, eps: float = 1e-12):
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    `jnp.linalg.inv` lowers to an LU factorization whose pivoting loops
    SERIALIZE on TPU — for the [P, 3, 3] landmark blocks inverted every LM
    iteration of bundle adjustment that was the single largest cost of the
    whole solve.  The adjugate form is ~30 fully-parallel elementwise ops."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    adj = jnp.stack([jnp.stack([co00, co01, co02], -1),
                     jnp.stack([co10, co11, co12], -1),
                     jnp.stack([co20, co21, co22], -1)], -2)
    return adj * inv_det[..., None, None]


def chol_solve_small(A, b, jitter: float = 0.0):
    """Batched SPD solve A x = b for SMALL fixed n (<= ~8) via a Cholesky
    UNROLLED at trace time: every step is an elementwise op over the batch,
    so nothing serializes on TPU (LAPACK-style factorizations run pivot
    loops).  A: [..., n, n] SPD, b: [..., n] -> x [..., n]."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j] - sum((L[i][k] * L[j][k] for k in range(j)),
                                   start=jnp.zeros(A.shape[:-2], A.dtype))
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s + jitter, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        y[i] = (b[..., i] - sum((L[i][k] * y[k] for k in range(i)),
                                start=jnp.zeros(A.shape[:-2], A.dtype))) / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        x[i] = (y[i] - sum((L[k][i] * x[k] for k in range(i + 1, n)),
                           start=jnp.zeros(A.shape[:-2], A.dtype))) / L[i][i]
    return jnp.stack(x, -1)


def null_vector(A, iters: int = 12, eps: float = 1e-7):
    """Unit vector x minimizing |A x| for batched A [..., m, n] (m >= n-1).

    Inverse power iteration on (A^T A + eps*tr*I): converges to the
    eigenvector of the smallest eigenvalue.  Deterministic start vector.
    """
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    n = A.shape[-1]
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None] / n
    M = AtA + eps * tr * jnp.eye(n, dtype=A.dtype)
    lu = jax.scipy.linalg.lu_factor(M)

    x0 = jnp.full(A.shape[:-2] + (n,), 1.0 / jnp.sqrt(n), A.dtype)

    def body(_, x):
        y = jax.scipy.linalg.lu_solve(lu, x[..., None])[..., 0]
        return _normalize(y)

    return jax.lax.fori_loop(0, iters, body, x0)


def top_vector(M, iters: int = 50):
    """Dominant eigenvector of symmetric PSD M [..., n, n] by power iteration."""
    n = M.shape[-1]
    # deterministic, slightly asymmetric start to avoid orthogonal stall
    x0 = jnp.broadcast_to(
        jnp.linspace(1.0, 1.3, n, dtype=M.dtype), M.shape[:-2] + (n,)
    )
    x0 = _normalize(x0)

    def body(_, x):
        return _normalize(jnp.einsum("...ij,...j->...i", M, x))

    return jax.lax.fori_loop(0, iters, body, x0)


def jacobi_eigh(S, sweeps: int = 10):
    """Eigendecomposition of batched symmetric n x n (n small, static) via
    cyclic Jacobi.  Returns (w, V): eigenvalues DESCENDING, V columns =
    eigenvectors.  Used for 3x3 (svd3) and 4x4 (Horn quaternion) problems."""
    n = S.shape[-1]
    A = S
    V = jnp.broadcast_to(jnp.eye(n, dtype=S.dtype), S.shape).copy()

    def givens(A, V, p, q):
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        R = jnp.broadcast_to(jnp.eye(n, dtype=S.dtype), A.shape).copy()
        R = R.at[..., p, p].set(c)
        R = R.at[..., q, q].set(c)
        R = R.at[..., p, q].set(s)
        R = R.at[..., q, p].set(-s)
        return jnp.swapaxes(R, -1, -2) @ A @ R, V @ R

    pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]
    for _ in range(sweeps):
        for (p, q) in pairs:
            A, V = givens(A, V, p, q)

    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(-w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def eigh3(S, sweeps: int = 10):
    """3x3 symmetric eigendecomposition (descending) — see jacobi_eigh."""
    return jacobi_eigh(S, sweeps)


def svd3(A, sweeps: int = 10):
    """SVD of batched 3x3 matrices: returns (U, s, Vt) with s descending.

    V, s^2 from Jacobi eigh of A^T A; U columns from A v_i with a
    cross-product completion for the smallest direction."""
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    w, V = eigh3(AtA, sweeps)
    s = jnp.sqrt(jnp.clip(w, 0.0))
    Av1 = jnp.einsum("...ij,...j->...i", A, V[..., 0])
    Av2 = jnp.einsum("...ij,...j->...i", A, V[..., 1])
    u1 = _normalize(Av1)
    u2 = _normalize(Av2 - jnp.sum(Av2 * u1, axis=-1, keepdims=True) * u1)
    u3 = jnp.cross(u1, u2)
    Av3 = jnp.einsum("...ij,...j->...i", A, V[..., 2])
    sgn = jnp.sign(jnp.sum(u3 * Av3, axis=-1) + 1e-30)
    u3 = u3 * sgn[..., None]
    U = jnp.stack([u1, u2, u3], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)
