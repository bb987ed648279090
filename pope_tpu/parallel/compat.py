"""Small jax-version compatibility shims shared by the parallel modules."""

from __future__ import annotations


def shard_map_compat(fn, mesh, in_specs, out_specs):
    """`jax.shard_map` across the 0.7/0.8 API boundary with the replication
    checker off (rank-gated psum outputs cannot be statically proven
    replicated; the flag was renamed check_rep -> check_vma in 0.8)."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover
        return shard_map(fn, check_rep=False, **kwargs)
