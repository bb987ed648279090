"""Host-side per-pair runner: file IO + GT handling around the jitted
pipeline (the body of the reference eval loop, eval_linemod_json.py:51-168).

`run_pair` mirrors the reference's serial loop; `run_pairs` is the TPU-native
production path — it batches the pair axis through every stage (one encoder
dispatch, one AMG dispatch, one retrieval/match/solve dispatch each per
batch) so the per-dispatch tunnel RTT amortizes across B pairs.
"""

from __future__ import annotations

import os
import zlib
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pope_tpu.models.dinov2.preprocess import preprocess_image
from pope_tpu.pipeline.pose_pipeline import PipelineExecutor


_EXECUTORS = {}


def get_executor(models, crop_size: int) -> PipelineExecutor:
    """Per-(models, crop_size) cached stage-jitted executor."""
    key = (id(models), crop_size)
    if key not in _EXECUTORS:
        _EXECUTORS[key] = PipelineExecutor(models, crop_size)
    return _EXECUTORS[key]


def pair_key(pair_name: str):
    """Stable per-pair PRNG key: crc32 digest, NOT Python's salted hash()
    (reproducible across processes without pinning PYTHONHASHSEED)."""
    return jax.random.PRNGKey(zlib.crc32(pair_name.encode()) & 0x7FFFFFFF)


def load_pose_4x4(path: str) -> np.ndarray:
    pose = np.loadtxt(path)
    if pose.shape == (3, 4):
        pose = np.vstack([pose, [0, 0, 0, 1]])
    return pose.astype(np.float32)


def relative_pose_np(pose0: np.ndarray, pose1: np.ndarray) -> np.ndarray:
    """T_0to1 = pose1 @ inv(pose0) on 4x4 homogeneous poses, host numpy
    (eval_linemod_json.py:143)."""
    return (pose1 @ np.linalg.inv(pose0)).astype(np.float32)


def pose_errors_np(T_0to1: np.ndarray, R: np.ndarray, t: np.ndarray):
    """(t_err_deg, R_err_deg) vs the GT relative pose — numpy twin of
    geometry.pose.relative_pose_error (metrics.py:10-24) for the host edge
    (no eager device ops in record building)."""
    t_gt = T_0to1[:3, 3]
    n = np.linalg.norm(t) * np.linalg.norm(t_gt)
    cos_t = float(np.dot(t, t_gt) / max(n, 1e-12))
    t_err = np.rad2deg(np.arccos(np.clip(cos_t, -1.0, 1.0)))
    t_err = min(t_err, 180.0 - t_err)
    cos_r = (np.trace(R.T @ T_0to1[:3, :3]) - 1.0) / 2.0
    r_err = np.rad2deg(np.abs(np.arccos(np.clip(cos_r, -1.0, 1.0))))
    return float(t_err), float(r_err)


def gt_bbox_from_box3d(box3d_path: str, pose1: np.ndarray, K1: np.ndarray) -> Optional[np.ndarray]:
    """Project the object's 3-D bbox corners and take the bounding rect
    (eval_linemod_json.py:152-158)."""
    if not os.path.exists(box3d_path):
        return None
    corners = np.loadtxt(box3d_path)
    cam = corners @ pose1[:3, :3].T + pose1[:3, 3]
    pix = cam @ K1.T
    dpt = pix[:, 2]
    dpt = np.where(np.abs(dpt) < 1e-4, np.where(dpt < 0, -1e-4, 1e-4), dpt)
    pts2d = (pix[:, :2] / dpt[:, None]).astype(np.int32)
    x0, y0 = pts2d.min(0)
    x1, y1 = pts2d.max(0)
    return np.array([x0, y0, x1, y1])


def _load_pair_host(paths):
    """Decode one manifest pair's files on host."""
    import cv2

    img0 = cv2.cvtColor(cv2.imread(paths.image0), cv2.COLOR_BGR2RGB)
    img1 = cv2.cvtColor(cv2.imread(paths.image1), cv2.COLOR_BGR2RGB)
    K0 = np.loadtxt(paths.k0, delimiter=" ").astype(np.float32)
    K1 = np.loadtxt(paths.k1, delimiter=" ").astype(np.float32)
    pose0 = load_pose_4x4(paths.pose0)
    pose1 = load_pose_4x4(paths.pose1)
    return img0, img1, K0, K1, pose0, pose1


def _record(paths, host, result_np):
    """Build the eval record for one pair from host-side arrays."""
    img0, img1, K0, K1, pose0, pose1 = host
    T_0to1 = relative_pose_np(pose0, pose1)
    R = np.asarray(result_np["R"], np.float32)
    t = np.asarray(result_np["t"], np.float32)
    ok = bool(result_np["ok"])
    if ok:
        t_err, R_err = pose_errors_np(T_0to1, R, t)
    else:
        t_err = R_err = None
    gt_bbox = gt_bbox_from_box3d(paths.box3d, pose1, K1)
    return {
        "object": paths.object_label,
        "identifier": paths.pair_name,
        "ok": ok,
        "R_err": R_err,
        "t_err": t_err,
        "pre_bbox": np.asarray(result_np["pre_bbox"]).astype(int).tolist(),
        "gt_bbox": gt_bbox.tolist() if gt_bbox is not None else None,
        "n_strong": int(result_np["n_strong"]),
        "T_0to1": T_0to1,
        "R": R,
        "t": t,
    }


def run_pair(models, paths, spec, key=None):
    """Execute the full pipeline for one manifest pair; returns the record
    consumed by eval.evaluate_pairs. Every device stage is jitted."""
    key = key if key is not None else pair_key(paths.pair_name)
    host = _load_pair_host(paths)
    img0, img1, K0, K1 = host[:4]

    executor = get_executor(models, spec.crop_size)
    # prompt cls token (eval_linemod_json.py:64-65), jitted
    ref_in = preprocess_image(img0, center_crop=True)
    ref_cls = executor.prompt_cls(ref_in)[0]

    amg_res = models.amg.generate(img1)

    result = executor.estimate_pair(
        jnp.asarray(img0, jnp.float32) / 255.0,
        jnp.asarray(img1, jnp.float32) / 255.0,
        jnp.asarray(K0),
        jnp.asarray(K1),
        amg_res,
        ref_cls,
        key,
    )
    result_np = {
        "R": np.asarray(result.R), "t": np.asarray(result.t),
        "ok": np.asarray(result.ok), "pre_bbox": np.asarray(result.pre_bbox),
        "n_strong": np.asarray(result.n_strong),
    }
    return _record(paths, host, result_np)


def _boxes_xywh_np(boxes_xyxy: np.ndarray) -> np.ndarray:
    b = np.asarray(boxes_xyxy, np.float32)
    return np.stack([b[:, 0], b[:, 1], b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], -1)


def run_pairs(models, paths_list, spec, keys=None, hosts=None) -> List[dict]:
    """Batched production path over B manifest pairs (same image shapes):

      1 x batched SAM encode -> 1 x batched AMG decode (+host postproc)
      -> 1 x batched prompt cls forward -> 1 x each retrieve/match/solve.

    ~6 dispatches per batch instead of ~5 per pair; results bit-identical to
    run_pair per pair (vmap of the same stage functions, test_batched_pairs).

    hosts: optional preloaded [_load_pair_host(p)] list (lets a prefetch
    thread overlap image decode with device compute).
    """
    B = len(paths_list)
    if hosts is None:
        hosts = [_load_pair_host(p) for p in paths_list]
    if keys is None:
        keys = jnp.stack([pair_key(p.pair_name) for p in paths_list])

    executor = get_executor(models, spec.crop_size)

    amg_results = models.amg.generate_batch([h[1] for h in hosts])
    ref_in = np.concatenate(
        [preprocess_image(h[0], center_crop=True) for h in hosts]
    )
    ref_cls = executor.prompt_cls(ref_in)  # (B, D)

    img0_b = jnp.asarray(np.stack([h[0] for h in hosts]), jnp.float32) / 255.0
    img1_b = jnp.asarray(np.stack([h[1] for h in hosts]), jnp.float32) / 255.0
    K0_b = jnp.asarray(np.stack([h[2] for h in hosts]))
    K1_b = jnp.asarray(np.stack([h[3] for h in hosts]))
    boxes_b = jnp.asarray(np.stack([_boxes_xywh_np(r.boxes) for r in amg_results]))
    valid_b = jnp.asarray(np.stack([np.asarray(r.valid) for r in amg_results]))

    run = executor.batched()
    res = run(img0_b, img1_b, K0_b, K1_b, boxes_b, valid_b, ref_cls, keys)
    # one bulk device->host transfer for everything the records need
    R_b, t_b, ok_b, bbox_b, n_strong_b = jax.device_get(
        (res.R, res.t, res.ok, res.pre_bbox, res.n_strong)
    )
    return [
        _record(
            paths_list[i],
            hosts[i],
            {
                "R": R_b[i], "t": t_b[i], "ok": ok_b[i],
                "pre_bbox": bbox_b[i], "n_strong": n_strong_b[i],
            },
        )
        for i in range(B)
    ]
