"""Closed-form rigid/similarity alignment (Kabsch / Umeyama).

Used by the regressor path and by ADD-style metrics; the reference leans on
these semantics in pose/learn_umeyama.py and utils/base_utils.py pose algebra.
"""

from __future__ import annotations

import jax.numpy as jnp

from pope_tpu.utils.precision import f32_matmul


@f32_matmul
def kabsch(P, Q, weights=None):
    """Optimal rotation R (and translation t) minimizing ||R P + t - Q||.

    P, Q: (N, 3) corresponding point sets. Returns (R (3,3), t (3,)).
    """
    if weights is None:
        weights = jnp.ones(P.shape[0], P.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    mu_p = jnp.sum(P * w[:, None], axis=0)
    mu_q = jnp.sum(Q * w[:, None], axis=0)
    Pc = P - mu_p
    Qc = Q - mu_q
    H = (Pc * w[:, None]).T @ Qc
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], P.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = mu_q - R @ mu_p
    return R, t


@f32_matmul
def umeyama_alignment(P, Q, weights=None):
    """Similarity transform (s, R, t) minimizing ||s R P + t - Q||
    (Umeyama 1991)."""
    if weights is None:
        weights = jnp.ones(P.shape[0], P.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    mu_p = jnp.sum(P * w[:, None], axis=0)
    mu_q = jnp.sum(Q * w[:, None], axis=0)
    Pc = P - mu_p
    Qc = Q - mu_q
    cov = (Qc * w[:, None]).T @ Pc  # (3, 3)
    var_p = jnp.sum(w * jnp.sum(Pc**2, axis=-1))
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    Dm = jnp.diag(jnp.array([1.0, 1.0, 1.0], P.dtype)).at[2, 2].set(d)
    R = U @ Dm @ Vt
    s = jnp.trace(jnp.diag(S) @ Dm) / jnp.maximum(var_p, 1e-12)
    t = mu_q - s * (R @ mu_p)
    return s, R, t
