"""Distributed collectives / rank helpers.

Reference behavior: src/utils/comm.py (detectron2-copied NCCL process-group
helpers: get_world_size/get_rank/is_main_process, all_gather of picklable
objects, reduce_dict) and dinov2/distributed/__init__.py (env bootstrap).
TPU-native: jax.distributed + named-mesh collectives; cross-host gathering
of eval metrics uses multihost_utils.process_allgather (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax


def initialize_distributed(**kwargs):
    """jax.distributed.initialize, tolerant of single-process runs
    (replaces dist.init_process_group, scripts/train_dinov2_pose.py:25-29)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process / already initialized


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_arrays(tree):
    """Gather array pytrees from every host (comm.py all_gather for the
    numeric case; metric lists concatenate along axis 0)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def reduce_dict(metrics: Dict[str, Any], average: bool = True) -> Dict[str, Any]:
    """Mean/sum scalar metric dicts across hosts (comm.py reduce_dict)."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(
        {k: np.asarray(v, np.float64) for k, v in metrics.items()}
    )
    op = np.mean if average else np.sum
    return {k: op(v, axis=0) for k, v in stacked.items()}


def psum_in_mesh(x, axis_name: str = "dp"):
    """In-jit gradient/metric allreduce (the DDP allreduce surface)."""
    return jax.lax.psum(x, axis_name)
