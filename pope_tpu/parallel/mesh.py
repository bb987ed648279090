"""Mesh + sharding helpers.

Axes:
  dp — data parallel (pairs / batch axis). The reference's only real batching
       axes are the eval pair loop and AMG's 2048-point prompt batch
       (SURVEY.md §2.5); both shard here.
  tp — tensor parallel (attention heads / hidden features), also reused as
       the sequence-parallel axis for token-sharded activations.

The reference has no TP/PP/SP anywhere (SURVEY.md §2.5); these exist because
the TPU build scales by sharding one program over a mesh instead of the
reference's per-GPU model placement (pope_model_api.py:182-184).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    """Build a (dp, tp) mesh over the first `n_devices` devices.

    tp defaults to 2 when the device count is even, else 1.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 2 else 1
    dp = n // tp
    dev_array = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def shard_batch(mesh: Mesh, tree, sp_axis: int | None = None):
    """Shard every array's leading axis over dp (and optionally axis
    `sp_axis` over tp, for sequence-parallel token layouts)."""

    def put(x):
        spec = [None] * x.ndim
        spec[0] = "dp"
        if sp_axis is not None and x.ndim > sp_axis and x.shape[sp_axis] % mesh.shape["tp"] == 0:
            spec[sp_axis] = "tp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def shard_params_tp(mesh: Mesh, params, min_size: int = 1024):
    """Tensor-parallel param layout: shard the trailing (output-features)
    axis of large kernels over tp; small tensors replicate. XLA's SPMD
    partitioner propagates the layout through the matmuls and inserts the
    reduce/all-gather collectives."""
    tp = mesh.shape["tp"]

    def put(x):
        if x.ndim >= 2 and x.size >= min_size and x.shape[-1] % tp == 0:
            spec = [None] * (x.ndim - 1) + ["tp"]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, params)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
