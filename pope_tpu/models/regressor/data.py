"""Regressor dataset: loads extraction dumps + GT for training/eval.

Reference behavior: pose/dataset.py:10-139 (per-dataset path conventions,
skip unreadable/empty dumps, crops resized to 224, gt_bbox from projected
box3d corners), pose/utils.py:108-128 (collate: subsample or zero-pad mkpts
to num_sample, seeded), train0429_mkpts.py:76-102 (seeded 80/20 split;
supervision mode 'relative_r-gt_t': relative rotation + GT translation).
"""

from __future__ import annotations

import os
import random
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from pope_tpu.eval.manifest import DATASETS, iter_pairs, load_manifest


def load_pose_dataset(
    dataset: str,
    data_root: str,
    pairs_dir: str,
    points_dir: str,
    img_size: int = 224,
    max_pairs: Optional[int] = None,
    load_images: bool = True,
) -> List[Dict]:
    """Load all extraction dumps into memory (pose/dataset.py:75-129)."""
    import cv2

    spec = DATASETS[dataset]
    manifest = load_manifest(pairs_dir, spec)
    data = []
    for paths in iter_pairs(data_root, spec, manifest):
        if max_pairs is not None and len(data) >= max_pairs:
            break
        label = paths.pair_name.split("/")[0]
        points_name = paths.pair_name.split("/")[-1]
        base = Path(points_dir) / label
        try:
            mkpts0 = np.loadtxt(base / "mkpts0" / f"{points_name}.txt")
            mkpts1 = np.loadtxt(base / "mkpts1" / f"{points_name}.txt")
            pre_bbox = np.loadtxt(base / "pre_bbox" / f"{points_name}.txt")
            pre_K = np.loadtxt(base / "pre_K" / f"{points_name}.txt")
        except (OSError, ValueError):
            continue  # skip missing dumps (dataset.py:84-88)
        if mkpts0.ndim != 2 or mkpts0.shape[0] == 0 or mkpts0.shape != mkpts1.shape:
            continue

        pose0 = np.loadtxt(paths.pose0)
        pose1 = np.loadtxt(paths.pose1)
        if pose0.shape[0] == 3:
            pose0 = np.vstack([pose0, [0, 0, 0, 1]])
        if pose1.shape[0] == 3:
            pose1 = np.vstack([pose1, [0, 0, 0, 1]])
        K0 = np.loadtxt(paths.k0, delimiter=" ")
        K1 = np.loadtxt(paths.k1, delimiter=" ")

        item = {
            "K0": K0, "K1": K1, "pose0": pose0, "pose1": pose1,
            "pre_bbox": pre_bbox, "pre_K": pre_K,
            "mkpts0": mkpts0.astype(np.float32), "mkpts1": mkpts1.astype(np.float32),
            "pair_name": paths.pair_name, "name": label,
        }
        if load_images:
            img0 = cv2.imread(str(base / "img0" / f"{points_name}.png"))
            img1 = cv2.imread(str(base / "img1" / f"{points_name}.png"))
            if img0 is None or img1 is None:
                continue
            item["img0"] = cv2.resize(img0, (img_size, img_size)).astype(np.float32) / 255.0
            item["img1"] = cv2.resize(img1, (img_size, img_size)).astype(np.float32) / 255.0
        data.append(item)
    return data


def sample_mkpts(mkpts: np.ndarray, num_sample: int, rng: random.Random) -> np.ndarray:
    """Subsample or zero-pad to num_sample rows (pose/utils.py:108-128)."""
    n = mkpts.shape[0]
    if n > num_sample:
        idx = rng.sample(range(n), num_sample)
        return mkpts[idx]
    return np.concatenate([mkpts, np.zeros((num_sample - n, 2), np.float32)], axis=0)


def make_batches(
    data: List[Dict],
    num_sample: int,
    batch_size: int,
    seed: int = 20231223,
    shuffle: bool = True,
    with_images: bool = False,
):
    """Yield jnp-ready batches with 'relative_r-gt_t' supervision
    (train0429_mkpts.py:158-167: gt_R = relative rotation, gt_t = target GT
    translation)."""
    rng = random.Random(seed)
    order = list(range(len(data)))
    if shuffle:
        rng.shuffle(order)
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        items = [data[i] for i in idx]
        batch = {
            "mkpts0": np.stack([sample_mkpts(it["mkpts0"], num_sample, rng) for it in items]),
            "mkpts1": np.stack([sample_mkpts(it["mkpts1"], num_sample, rng) for it in items]),
            "gt_R": np.stack(
                [
                    (it["pose1"] @ np.linalg.inv(it["pose0"]))[:3, :3] for it in items
                ]
            ).astype(np.float32),
            "gt_t": np.stack([it["pose1"][:3, 3] for it in items]).astype(np.float32),
        }
        if with_images:
            batch["img0"] = np.stack([it["img0"] for it in items])
            batch["img1"] = np.stack([it["img1"] for it in items])
        yield batch


def train_val_split(data: List[Dict], seed: int = 20231223, val_frac: float = 0.2):
    """Seeded 80/20 random split (train0429_mkpts.py:76-82)."""
    rng = random.Random(seed)
    order = list(range(len(data)))
    rng.shuffle(order)
    n_val = int(len(order) * val_frac)
    val_idx = set(order[:n_val])
    train = [d for i, d in enumerate(data) if i not in val_idx]
    val = [d for i, d in enumerate(data) if i in val_idx]
    return train, val
