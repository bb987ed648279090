"""Checkpoint save/load (orbax) + torch-checkpoint ingestion.

Reference behavior: torch.load state-dict loading at build_sam.py:102-105 /
dinov2 utils/utils.py:21 / pope_model_api.py:177-180 (checkpoint-key and
prefix handling), whole-module torch.save in the regressor trainers
(train0429_mkpts.py:205), PL ModelCheckpoint in scripts/train.py:94-97.
TPU-native: orbax StandardCheckpointer for jax pytrees; torch .pth files go
through the per-model converters (models/*/convert.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def save_checkpoint(path: str, tree: Any):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, like: Optional[Any] = None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), like)


def latest_checkpoint(ckpt_dir: str, prefix: str = "step_") -> Optional[str]:
    """Auto-resume discovery (scripts/train_dinov2_pose.py:215-231)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith(prefix):
            try:
                steps.append((int(name[len(prefix):]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def load_torch_state_dict(path: str, checkpoint_key: Optional[str] = None):
    """Read a torch .pth into {name: np.ndarray}, unwrapping the common
    {'state_dict': ...}/{'model': ...}/checkpoint_key layouts."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in (checkpoint_key, "state_dict", "model"):
        if key and isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}
