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


def pair_keys_np(paths_list) -> np.ndarray:
    """(B, 2) uint32 threefry keys built on host (== PRNGKey(crc32) without
    B eager device dispatches)."""
    return np.stack(
        [
            np.array([0, zlib.crc32(p.pair_name.encode()) & 0x7FFFFFFF], np.uint32)
            for p in paths_list
        ]
    )


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


def epipolar_errors_np(T_0to1, mkpts0, mkpts1, K0, K1):
    """Per-match squared symmetric epipolar error vs the GT relative pose —
    host numpy twin of geometry.epipolar.compute_symmetric_epipolar_errors
    (src/utils/metrics.py:27-66). mkpts1/K1 live in the selected crop frame."""
    R, t = T_0to1[:3, :3], T_0to1[:3, 3]
    E = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]], np.float64
    ) @ R.astype(np.float64)
    p0 = (mkpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    p1 = (mkpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    h0 = np.concatenate([p0, np.ones_like(p0[:, :1])], -1)
    h1 = np.concatenate([p1, np.ones_like(p1[:, :1])], -1)
    Ep0 = h0 @ E.T
    Etp1 = h1 @ E
    num = np.sum(h1 * Ep0, -1) ** 2
    return num * (
        1.0 / np.maximum(Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2, 1e-18)
        + 1.0 / np.maximum(Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2, 1e-18)
    )


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
    # matching-precision axis (prec@5e-4, src/utils/metrics.py:167-178):
    # epipolar error of each kept match vs the GT relative pose
    if "mkpts0" in result_np:
        mv = np.asarray(result_np["match_valid"], bool)
        epi_errs = epipolar_errors_np(
            T_0to1,
            np.asarray(result_np["mkpts0"], np.float64)[mv],
            np.asarray(result_np["mkpts1"], np.float64)[mv],
            K0, np.asarray(result_np["pre_K"], np.float64),
        )
    else:
        epi_errs = np.zeros((0,))
    return {
        "object": paths.object_label,
        "identifier": paths.pair_name,
        "ok": ok,
        "R_err": R_err,
        "t_err": t_err,
        "pre_bbox": np.asarray(result_np["pre_bbox"]).astype(int).tolist(),
        "gt_bbox": gt_bbox.tolist() if gt_bbox is not None else None,
        "n_strong": int(result_np["n_strong"]),
        # capacity-saturation telemetry ("no silent caps")
        "n_dropped_masks": int(result_np.get("n_dropped_masks", 0)),
        "n_dropped_matches": int(result_np.get("n_dropped_matches", 0)),
        "epi_errs": epi_errs,
        "T_0to1": T_0to1,
        "R": R,
        "t": t,
    }


def run_pair(models, paths, spec, key=None):
    """Execute the full pipeline for one manifest pair; returns the record
    consumed by eval.evaluate_pairs. Delegates to the batched production
    path with B=1 (every device stage jitted, one uint8 upload per frame —
    the reference's serial loop shape, eval_linemod_json.py:51)."""
    keys = None if key is None else jnp.asarray(key)[None]
    return run_pairs(models, [paths], spec, keys=keys)[0]



def prepare_batch(paths_list, mesh=None):
    """Host side of one batch: decode files and START the uint8 uploads.

    Runs in the loader's prefetch thread so disk IO and the h2d transfers
    (the tunnel's ~6 MB/s upload is the binding constraint of this
    deployment; each frame ships once, as uint8) overlap the previous
    batch's device compute.

    mesh: optional dp mesh — uploads land directly in the dp-sharded layout
    so every stage runs SPMD-partitioned over the pair axis.
    """
    if mesh is None:
        put = jax.device_put
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x):
            return jax.device_put(
                x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
            )

    hosts = [_load_pair_host(p) for p in paths_list]
    dev = {
        "img0_u8": put(np.stack([h[0] for h in hosts]).astype(np.uint8)),
        "img1_u8": put(np.stack([h[1] for h in hosts]).astype(np.uint8)),
        "K0": put(np.stack([h[2] for h in hosts])),
        "K1": put(np.stack([h[3] for h in hosts])),
        "keys": put(pair_keys_np(paths_list)),
    }
    return hosts, dev


def dispatch_pairs(models, paths_list, spec, keys=None, hosts=None, dev=None, mesh=None):
    """Queue the whole device side of one batch WITHOUT syncing: returns a
    pending handle for finish_pairs. Both stage dispatches are async,
    so a caller can keep batch N+1's programs in the device queue while it
    builds batch N's records (software pipelining across batches — the
    device never idles on host record-building).

    mesh: optional dp mesh; inputs upload dp-sharded (prepare_batch) and the
    SPMD partitioner splits AMG + the fused program across the chips."""
    if hosts is None or dev is None:
        hosts, dev = prepare_batch(paths_list, mesh=mesh)
    keys = keys if keys is not None else dev["keys"]

    executor = get_executor(models, spec.crop_size)

    # AMG (encode+decode+filters+NMS+small-region cleanup) runs as ONE
    # device program whose outputs stay on device: no mask d2h, no host
    # postprocess, no box re-upload. With dp-sharded inputs the jitted
    # program partitions over the pair axis automatically.
    boxes_b, valid_b, dropped_b = models.amg.generate_boxes_batch(dev["img1_u8"])

    # prompt cls computes INSIDE the fused program (fold_prompt): the
    # preprocessed prompt rides the retrieval crop batch, so the whole
    # retrieve+match+solve side stays one dispatch with no standalone
    # B-image DINOv2 program
    run = executor.batched(mesh=mesh)
    small, matches = run(
        dev["img0_u8"], dev["img1_u8"], dev["K0"], dev["K1"],
        boxes_b, valid_b, None, keys, dropped_b, packed=True,
    )
    # start the d2h copies NOW (they queue behind the programs that produce
    # them), so finish_pairs' device_get finds host-ready buffers instead of
    # paying transfer latency inside the synchronous fetch
    for arr in (small, matches):
        try:
            arr.copy_to_host_async()
        except (AttributeError, RuntimeError):  # sharded/older-runtime arrays
            break
    return (paths_list, hosts, small, matches)


def finish_pairs(pending) -> List[dict]:
    """Sync one dispatched batch (ONE bulk device->host transfer of two
    leaves) and build its records."""
    paths_list, hosts, small, matches = pending
    small_b, matches_b = jax.device_get((small, matches))
    return [
        _record(paths_list[i], hosts[i], _unpack_record(small_b[i], matches_b[i]))
        for i in range(len(paths_list))
    ]


def run_pairs(models, paths_list, spec, keys=None, hosts=None, dev=None, mesh=None) -> List[dict]:
    """Batched production path over B manifest pairs (same image shapes):

      1 x batched SAM encode (resize fused) -> 1 x batched AMG decode
      -> 1 x fused retrieve/match/solve (prompt cls folded into the
        retrieval crop batch).

    Each frame uploads exactly once as uint8; all derived tensors (SAM
    resize, DINOv2 prompt crop, grayscale) are computed on device. Results
    match run_pair per pair (vmap of the same stage functions,
    test_batched_pairs).

    hosts/dev: optional preloaded host arrays + started device transfers
    from prepare_batch (lets a prefetch thread overlap IO + upload with
    device compute).
    """
    return finish_pairs(
        dispatch_pairs(models, paths_list, spec, keys=keys, hosts=hosts, dev=dev, mesh=mesh)
    )


def _unpack_record(small: np.ndarray, matches: np.ndarray) -> dict:
    """Inverse of the fused runner's record packing (pose_pipeline
    run_fused): small (29,) = R(9) t(3) ok(1) pre_bbox(4) pre_K(9)
    n_strong(1) n_dropped_masks(1) n_dropped_matches(1); matches (M, 6) =
    mkpts0(2) mkpts1(2) mconf(1) valid(1)."""
    return {
        "R": small[0:9].reshape(3, 3),
        "t": small[9:12],
        "ok": small[12] > 0.5,
        "pre_bbox": small[13:17],
        "pre_K": small[17:26].reshape(3, 3),
        "n_strong": small[26],
        "n_dropped_masks": small[27] if small.shape[0] > 27 else 0.0,
        "n_dropped_matches": small[28] if small.shape[0] > 28 else 0.0,
        "mkpts0": matches[:, 0:2],
        "mkpts1": matches[:, 2:4],
        "mconf": matches[:, 4],
        "match_valid": matches[:, 5] > 0.5,
    }
