"""Extended geometry/IO utilities completing the utils/base_utils.py surface.

Reference behavior: utils/base_utils.py — compute_F :286-299 (fundamental
from two K's and relative R, t), triangulate :588-594 (DLT triangulation of
normalized correspondences), 2-D transformation algebra :596-660 (compose/
inverse/apply/decompose + crop transform), FPS sampling :558-586, ply and
pickle IO :21-75. jnp where batching helps, numpy at the host edge.
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np
import jax.numpy as jnp

from pope_tpu.utils.precision import f32_matmul
from pope_tpu.geometry.pose import skew


@f32_matmul
def compute_F(K1, K2, R, t):
    """Fundamental matrix from intrinsics + relative pose (base_utils.py:286).
    t: (3, 1) or (3,)."""
    K1 = jnp.asarray(K1, jnp.float32)
    K2 = jnp.asarray(K2, jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32).reshape(3, 1)
    A = K1 @ R.T @ t  # (3, 1)
    C = skew(A[:, 0])
    return jnp.linalg.inv(K2).T @ R @ K1.T @ C


@f32_matmul
def triangulate_dlt(kpts0, kpts1, pose0, pose1, K0, K1):
    """DLT triangulation of pixel correspondences (base_utils.py:588-594,
    cv2.triangulatePoints semantics). poses are (3, 4) world->cam.
    Returns (N, 3) world points."""
    k0 = jnp.concatenate([kpts0, jnp.ones_like(kpts0[:, :1])], -1) @ jnp.linalg.inv(K0).T
    k1 = jnp.concatenate([kpts1, jnp.ones_like(kpts1[:, :1])], -1) @ jnp.linalg.inv(K1).T

    def tri_one(p0, p1):
        # rows: x*P2 - P0, y*P2 - P1 for each view
        A = jnp.stack(
            [
                p0[0] * pose0[2] - pose0[0],
                p0[1] * pose0[2] - pose0[1],
                p1[0] * pose1[2] - pose1[0],
                p1[1] * pose1[2] - pose1[1],
            ]
        )  # (4, 4)
        _, vecs = jnp.linalg.eigh(A.T @ A)
        X = vecs[:, 0]
        return X[:3] / X[3]

    import jax

    return jax.vmap(tri_one)(k0, k1)


# ---- 2-D transformation algebra (host, numpy) ----

def transformation_compose_2d(t0: np.ndarray, t1: np.ndarray) -> np.ndarray:
    """Apply t0 then t1 on (2, 3) affines (base_utils.py:609-621)."""
    R = t1[:, :2] @ t0[:, :2]
    t = t1[:, :2] @ t0[:, 2] + t1[:, 2]
    return np.concatenate([R, t[:, None]], 1)


def transformation_inverse_2d(trans: np.ndarray) -> np.ndarray:
    A_ = np.linalg.inv(trans[:2, :2])
    return np.concatenate([A_, -A_ @ trans[:, 2:]], 1)


def transformation_apply_2d(trans: np.ndarray, points: np.ndarray) -> np.ndarray:
    return points @ trans[:, :2].T + trans[:, 2:].T


def transformation_offset_2d(x: float, y: float) -> np.ndarray:
    return np.concatenate([np.eye(2), np.asarray([x, y])[:, None]], 1).astype(np.float32)


def transformation_scale_2d(scale: float) -> np.ndarray:
    return np.concatenate([np.diag([scale, scale]), np.zeros([2, 1])], 1).astype(np.float32)


def transformation_rotation_2d(ang: float) -> np.ndarray:
    R = np.asarray([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    return np.concatenate([R, np.zeros([2, 1])], 1).astype(np.float32)


def transformation_decompose_2d(M: np.ndarray):
    scale = np.sqrt(np.linalg.det(M[:2, :2]))
    rotation = np.arctan2(M[1, 0], M[0, 0])
    return scale, rotation, M[:2, 2]


def transformation_crop_2d(position, scale: float, angle: float, size: int) -> np.ndarray:
    """Center `position`, scale, rotate, recenter at size/2
    (base_utils.py transformation_crop)."""
    M = transformation_offset_2d(-position[0], -position[1])
    M = transformation_compose_2d(M, transformation_scale_2d(scale))
    M = transformation_compose_2d(M, transformation_rotation_2d(angle))
    return transformation_compose_2d(M, transformation_offset_2d(size / 2, size / 2))


# ---- sampling / IO ----

def sample_fps_points(points: np.ndarray, sample_num: int, init_center: bool = True) -> np.ndarray:
    """Farthest-point sampling (base_utils.py:558-586)."""
    n = points.shape[0]
    sample_num = min(n, sample_num)
    if init_center:
        cur = points.mean(0)
        out = [cur]
    else:
        cur = points[0]
        out = [cur]
    dist = np.full(n, 1e18)
    for _ in range(sample_num - 1 if init_center else sample_num - 1):
        dist = np.minimum(dist, np.linalg.norm(points - cur, axis=1))
        idx = int(np.argmax(dist))
        cur = points[idx]
        out.append(cur)
    return np.asarray(out)


def save_pickle(data, path: str):
    with open(path, "wb") as f:
        pickle.dump(data, f)


def read_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def load_ply_points(path: str) -> np.ndarray:
    """Minimal ascii/binary-little-endian PLY vertex reader (x, y, z)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n_vert = 0
        fmt = "ascii"
        props = []
        for line in header:
            parts = line.split()
            if parts[:2] == ["element", "vertex"]:
                n_vert = int(parts[2])
            elif parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "property" and n_vert and len(props) < 32:
                props.append((parts[1], parts[2]))
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n_vert)
            return data[:, :3].astype(np.float32)
        type_map = {"float": "f4", "double": "f8", "uchar": "u1", "int": "i4", "uint": "u4", "short": "i2", "ushort": "u2", "char": "i1", "float32": "f4", "float64": "f8", "uint8": "u1", "int32": "i4"}
        dtype = np.dtype([(name, "<" + type_map[t]) for t, name in props])
        data = np.frombuffer(f.read(n_vert * dtype.itemsize), dtype=dtype)
        return np.stack([data["x"], data["y"], data["z"]], -1).astype(np.float32)
