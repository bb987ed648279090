"""NeRF-style sinusoidal feature embedding.

Reference behavior: pose/model0429_mkpts.py:11-44 — x -> (x, sin(f_k x),
cos(f_k x), ...) with N_freqs bands; the mkpts models use logscale=False,
i.e. linearly spaced frequencies 1..2^(N-1).
"""

from __future__ import annotations

import jax.numpy as jnp


def nerf_embedding(x, n_freqs: int = 9, logscale: bool = False):
    """Embed (..., C) -> (..., C * (2 * n_freqs + 1)).

    Output channel order matches the reference: [x, sin(f0 x), cos(f0 x),
    sin(f1 x), cos(f1 x), ...] concatenated along the last axis.
    """
    if logscale:
        freqs = 2.0 ** jnp.linspace(0.0, n_freqs - 1, n_freqs)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)
    outs = [x]
    for f in freqs:
        outs.append(jnp.sin(f * x))
        outs.append(jnp.cos(f * x))
    return jnp.concatenate(outs, axis=-1)
