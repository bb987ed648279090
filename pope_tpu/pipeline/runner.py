"""Host-side per-pair runner: file IO + GT handling around the jitted
pipeline (the body of the reference eval loop, eval_linemod_json.py:51-168).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pope_tpu.geometry.pose import project_points, relative_pose, relative_pose_error
from pope_tpu.models.dinov2.preprocess import preprocess_image
from pope_tpu.pipeline.pose_pipeline import PipelineExecutor


_EXECUTORS = {}


def get_executor(models, crop_size: int) -> PipelineExecutor:
    """Per-(models, crop_size) cached stage-jitted executor."""
    key = (id(models), crop_size)
    if key not in _EXECUTORS:
        _EXECUTORS[key] = PipelineExecutor(models, crop_size)
    return _EXECUTORS[key]


def load_pose_4x4(path: str) -> np.ndarray:
    pose = np.loadtxt(path)
    if pose.shape == (3, 4):
        pose = np.vstack([pose, [0, 0, 0, 1]])
    return pose.astype(np.float32)


def gt_bbox_from_box3d(box3d_path: str, pose1: np.ndarray, K1: np.ndarray) -> Optional[np.ndarray]:
    """Project the object's 3-D bbox corners and take the bounding rect
    (eval_linemod_json.py:152-158)."""
    if not os.path.exists(box3d_path):
        return None
    corners = np.loadtxt(box3d_path)
    pts2d, _ = project_points(corners, pose1[:3, :4], K1)
    pts2d = np.asarray(pts2d).astype(np.int32)
    x0, y0 = pts2d.min(0)
    x1, y1 = pts2d.max(0)
    return np.array([x0, y0, x1, y1])


def run_pair(models, paths, spec, key=None):
    """Execute the full pipeline for one manifest pair; returns the record
    consumed by eval.evaluate_pairs."""
    import cv2

    key = key if key is not None else jax.random.PRNGKey(abs(hash(paths.pair_name)) % (2**31))
    img0 = cv2.cvtColor(cv2.imread(paths.image0), cv2.COLOR_BGR2RGB)
    img1 = cv2.cvtColor(cv2.imread(paths.image1), cv2.COLOR_BGR2RGB)
    K0 = np.loadtxt(paths.k0, delimiter=" ").astype(np.float32)
    K1 = np.loadtxt(paths.k1, delimiter=" ").astype(np.float32)

    # prompt cls token (eval_linemod_json.py:64-65)
    ref_in = preprocess_image(img0, center_crop=True)
    ref_cls = models.dinov2.apply(models.dinov2_variables, ref_in)["x_norm_clstoken"][0]

    amg_res = models.amg.generate(img1)

    result = get_executor(models, spec.crop_size).estimate_pair(
        jnp.asarray(img0, jnp.float32) / 255.0,
        jnp.asarray(img1, jnp.float32) / 255.0,
        jnp.asarray(K0),
        jnp.asarray(K1),
        amg_res,
        ref_cls,
        key,
    )

    pose0 = load_pose_4x4(paths.pose0)
    pose1 = load_pose_4x4(paths.pose1)
    T_0to1 = np.asarray(relative_pose(jnp.asarray(pose0), jnp.asarray(pose1)))

    ok = bool(result.ok)
    if ok:
        t_err, R_err = relative_pose_error(jnp.asarray(T_0to1), result.R, result.t)
        t_err, R_err = float(t_err), float(R_err)
    else:
        t_err = R_err = None

    gt_bbox = gt_bbox_from_box3d(paths.box3d, pose1, K1)
    return {
        "object": paths.object_label,
        "identifier": paths.pair_name,
        "ok": ok,
        "R_err": R_err,
        "t_err": t_err,
        "pre_bbox": np.asarray(result.pre_bbox).astype(int).tolist(),
        "gt_bbox": gt_bbox.tolist() if gt_bbox is not None else None,
        "n_strong": int(result.n_strong),
        "T_0to1": T_0to1,
        "R": np.asarray(result.R),
        "t": np.asarray(result.t),
    }
