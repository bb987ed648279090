"""Fixed-sweep Jacobi linalg vs numpy reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from pope_tpu.ops.linalg import eigh_jacobi, smallest_eigvec, svd3


@pytest.mark.slow
def test_eigh_jacobi_9x9(rng):
    B = 64
    X = rng.normal(0, 1, (B, 9, 9)).astype(np.float32)
    M = X @ X.transpose(0, 2, 1)
    w, V = eigh_jacobi(jnp.asarray(M))
    w_ref = np.linalg.eigvalsh(M)
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-4, atol=1e-3)
    # eigen equation
    resid = np.einsum("bij,bjk->bik", M, np.asarray(V)) - np.asarray(V) * np.asarray(w)[:, None, :]
    assert np.abs(resid).max() < 1e-2


@pytest.mark.slow
def test_smallest_eigvec_nullspace(rng):
    # construct M with a known (near-)nullspace
    B = 16
    v = rng.normal(0, 1, (B, 9)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    X = rng.normal(0, 1, (B, 9, 9)).astype(np.float32)
    P = np.eye(9)[None] - v[:, :, None] * v[:, None, :]
    M = np.einsum("bij,bjk,blk->bil", P @ X, (P @ X).transpose(0, 2, 1) * 0 + np.eye(9)[None], P @ X) if False else None
    A = np.einsum("bij,bj->bi", np.eye(9)[None] * 0 + X, v)  # not used
    # simpler: M = (P X)(P X)^T has nullvector v? No. Use M = P S P with S PSD.
    S = X @ X.transpose(0, 2, 1) + 0.5 * np.eye(9)[None]
    M = np.einsum("bij,bjk,bkl->bil", P, S, P).astype(np.float32)
    got = np.asarray(smallest_eigvec(jnp.asarray(M)))
    cos = np.abs(np.sum(got * v, axis=1)) / np.linalg.norm(got, axis=1)
    assert cos.min() > 0.999, cos.min()


def test_svd3_matches_numpy(rng):
    B = 32
    A = rng.normal(0, 1, (B, 3, 3)).astype(np.float32)
    U, s, Vt = svd3(jnp.asarray(A))
    s_ref = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-4, atol=1e-4)
    recon = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s), np.asarray(Vt))
    np.testing.assert_allclose(recon, A, atol=1e-3)


def test_svd3_rank2(rng):
    """Essential-matrix case: exact rank-2 input."""
    B = 8
    U0, _ = np.linalg.qr(rng.normal(0, 1, (B, 3, 3)))
    V0, _ = np.linalg.qr(rng.normal(0, 1, (B, 3, 3)))
    s0 = np.stack([np.full(B, 2.0), np.full(B, 1.0), np.zeros(B)], -1)
    A = np.einsum("bij,bj,bkj->bik", U0, s0, V0).astype(np.float32)
    U, s, Vt = svd3(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(s), s0, atol=1e-3)
    recon = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s), np.asarray(Vt))
    np.testing.assert_allclose(recon, A, atol=1e-3)
    # U is orthonormal even with the zero singular value
    eye = np.einsum("bij,bik->bjk", np.asarray(U), np.asarray(U))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (B, 3, 3)), atol=1e-3)
