"""Small-matrix linear algebra as fixed-iteration vectorized ops.

jnp.linalg.eigh / svd lower to while-loop LAPACK-style routines on TPU that
dominate the RANSAC solver's runtime at 9x9/3x3 sizes. These replacements
use fixed-sweep cyclic Jacobi: every step is a plain vectorized update that
batches over thousands of matrices and fuses into one XLA program — no data-
dependent control flow.

- eigh_jacobi: symmetric NxN (N small, e.g. 9) full eigendecomposition.
- svd3: 3x3 SVD built from the Jacobi eigendecomposition of A^T A
  (V, singular values) and U = A V / s with Gram-Schmidt completion for
  rank-deficient columns (the essential-matrix projection case, s3 ~ 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _jacobi_rotation(A, V, p: int, q: int):
    """One (p, q) Givens rotation zeroing A[p, q]; batched over leading dims."""
    app = A[..., p, p]
    aqq = A[..., q, q]
    apq = A[..., p, q]
    # rotation angle: theta = 0.5 atan2(2 apq, aqq - app)
    theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
    c = jnp.cos(theta)[..., None]
    s = jnp.sin(theta)[..., None]

    rows_p = A[..., p, :]
    rows_q = A[..., q, :]
    new_p = c * rows_p - s * rows_q
    new_q = s * rows_p + c * rows_q
    A = A.at[..., p, :].set(new_p).at[..., q, :].set(new_q)
    cols_p = A[..., :, p]
    cols_q = A[..., :, q]
    new_cp = c * cols_p - s * cols_q
    new_cq = s * cols_p + c * cols_q
    A = A.at[..., :, p].set(new_cp).at[..., :, q].set(new_cq)

    vcols_p = V[..., :, p]
    vcols_q = V[..., :, q]
    V = V.at[..., :, p].set(c * vcols_p - s * vcols_q)
    V = V.at[..., :, q].set(s * vcols_p + c * vcols_q)
    return A, V


@functools.partial(jax.jit, static_argnames=("sweeps",))
def eigh_jacobi(M, sweeps: int = 6):
    """Symmetric eigendecomposition by cyclic Jacobi with a fixed sweep count.

    M: (..., N, N) symmetric. Returns (eigenvalues (..., N) ascending,
    eigenvectors (..., N, N) with columns matching). 6 sweeps reach ~1e-7
    off-diagonal mass for N = 9.
    """
    N = M.shape[-1]
    A = jnp.asarray(M, jnp.float32)
    V = jnp.broadcast_to(jnp.eye(N, dtype=A.dtype), A.shape)
    V = V + jnp.zeros_like(A)  # materialize
    for _ in range(sweeps):
        for p in range(N - 1):
            for q in range(p + 1, N):
                A, V = _jacobi_rotation(A, V, p, q)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w_sorted, V_sorted


def smallest_eigvec(M, sweeps: int = 6):
    """Eigenvector of the smallest eigenvalue of symmetric (..., N, N) M."""
    _, V = eigh_jacobi(M, sweeps=sweeps)
    return V[..., :, 0]


@functools.partial(jax.jit, static_argnames=("sweeps",))
def svd3(A, sweeps: int = 8):
    """3x3 SVD: A = U diag(s) V^T with s descending, U/V proper-rotation-free
    (same conventions as jnp.linalg.svd up to column sign).

    Built from the Jacobi eigendecomposition of A^T A; U columns come from
    A V / s, with cross-product completion when a singular value is ~0 (the
    essential-matrix case).
    """
    A = jnp.asarray(A, jnp.float32)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, V = eigh_jacobi(AtA, sweeps=sweeps)
    # descending order
    w = w[..., ::-1]
    V = V[..., :, ::-1]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    AV = A @ V  # (..., 3, 3): columns = s_i * u_i
    safe = jnp.maximum(s, 1e-12)
    U = AV / safe[..., None, :]
    # u3 via orthonormal completion u1 x u2 whenever s3 is small relative to
    # s2: A v3 / s3 amplifies Jacobi noise (sqrt of the eigenvalue error)
    # and loses orthogonality well before s3 hits exact zero. Sign is
    # aligned with A v3 when that direction is meaningful.
    u3_cross = jnp.cross(U[..., :, 0], U[..., :, 1], axis=-1)
    av3 = AV[..., :, 2]
    dot = jnp.sum(u3_cross * av3, axis=-1, keepdims=True)
    sign = jnp.where(jnp.abs(dot) > 1e-12, jnp.sign(dot), 1.0)
    u3 = u3_cross * sign
    small = (s[..., 2] < 1e-2 * jnp.maximum(s[..., 1], 1e-20))[..., None]
    U = U.at[..., :, 2].set(jnp.where(small, u3, U[..., :, 2]))
    return U, s, jnp.swapaxes(V, -1, -2)
