"""Vision Mamba tests: selective-scan parity vs a sequential reference, and
model forward shape/finiteness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pope_tpu.models.regressor.vim import VimConfig, VisionMamba, selective_scan


def _ref_scan(u, delta, A, B, C, D):
    """Sequential reference of the mamba recurrence."""
    L, Din = u.shape
    N = A.shape[1]
    h = np.zeros((Din, N))
    ys = []
    for t in range(L):
        dA = np.exp(delta[t][:, None] * A)
        h = dA * h + delta[t][:, None] * B[t][None, :] * u[t][:, None]
        ys.append((h * C[t][None, :]).sum(-1) + u[t] * D)
    return np.stack(ys)


@pytest.mark.slow
def test_selective_scan_matches_sequential(rng):
    L, Din, N = 33, 8, 4
    u = rng.normal(0, 1, (L, Din)).astype(np.float32)
    delta = rng.uniform(0.01, 0.2, (L, Din)).astype(np.float32)
    A = -rng.uniform(0.1, 1.0, (Din, N)).astype(np.float32)
    B = rng.normal(0, 1, (L, N)).astype(np.float32)
    C = rng.normal(0, 1, (L, N)).astype(np.float32)
    D = rng.normal(0, 1, Din).astype(np.float32)
    out = np.asarray(selective_scan(*(jnp.asarray(x) for x in (u, delta, A, B, C, D))))
    ref = _ref_scan(u, delta, A, B, C, D)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_vim_forward(rng):
    model = VisionMamba(VimConfig(img_size=32, patch_size=16, embed_dim=32, depth=2, num_classes=0))
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_vim_unidirectional(rng):
    model = VisionMamba(VimConfig(img_size=32, patch_size=16, embed_dim=32, depth=1, num_classes=5, bidirectional=False))
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 5)
