"""Multi-scene training data: scene datasets, concatenation, per-rank splits
and scene-balanced sampling.

Reference behavior: src/datasets/scannet.py (npz-index pair dataset with
poses/intrinsics), src/datasets/megadepth.py (per-scene npz with depth),
src/lightning/data.py MultiSceneDataModule (concat + per-rank scene split),
src/utils/dataloader.py:6-23 get_local_split, src/datasets/sampler.py:5-77
RandomConcatSampler (n_samples_per_subset per scene, with/without
replacement, optional shuffle + repeat).
"""

from __future__ import annotations

import math
import random
from typing import List, Optional, Sequence

import numpy as np

from pope_tpu.data.readers import (
    read_megadepth_depth,
    read_megadepth_gray,
    read_scannet_depth,
    read_scannet_gray,
    read_scannet_intrinsic,
    read_scannet_pose,
)


def get_local_split(items: Sequence, world_size: int, rank: int, seed: int = 66):
    """Split `items` into `world_size` near-even chunks; pad by seeded
    resampling so every rank gets the same count (dataloader.py:6-23)."""
    n = len(items)
    per = math.ceil(n / world_size)
    rng = random.Random(seed)
    padded = list(items) + [rng.choice(items) for _ in range(per * world_size - n)]
    return padded[rank * per : (rank + 1) * per]


class ScanNetPairDataset:
    """Pairs from an npz index: arrays 'name' (N, 4: scene, seq, im0, im1)
    and optional 'score'. Loads grayscale frames, depths, world2cam poses."""

    def __init__(self, root: str, npz_path: str, intrinsic_path: str, min_overlap_score: float = 0.0):
        data = np.load(npz_path)
        names = data["name"]
        if "score" in data and min_overlap_score > 0:
            names = names[data["score"] > min_overlap_score]
        self.names = names
        self.root = root
        self.intrinsics = dict(np.load(intrinsic_path)) if intrinsic_path else None

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        import os.path as osp

        scene, seq, i0, i1 = self.names[idx]
        scene_name = f"scene{int(scene):04d}_{int(seq):02d}"
        d = osp.join(self.root, scene_name)
        out = {
            "image0": read_scannet_gray(osp.join(d, "color", f"{i0}.jpg")),
            "image1": read_scannet_gray(osp.join(d, "color", f"{i1}.jpg")),
            "depth0": read_scannet_depth(osp.join(d, "depth", f"{i0}.png")),
            "depth1": read_scannet_depth(osp.join(d, "depth", f"{i1}.png")),
            "T0": read_scannet_pose(osp.join(d, "pose", f"{i0}.txt")),
            "T1": read_scannet_pose(osp.join(d, "pose", f"{i1}.txt")),
            "pair_name": f"{scene_name}/{i0}_{i1}",
        }
        if self.intrinsics is not None:
            out["K"] = self.intrinsics[scene_name].reshape(3, 3)
        out["T_0to1"] = (out["T1"] @ np.linalg.inv(out["T0"])).astype(np.float32)
        out["T_1to0"] = np.linalg.inv(out["T_0to1"]).astype(np.float32)
        return out


class ConcatDataset:
    def __init__(self, datasets: List):
        self.datasets = datasets
        self.offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, idx):
        ds = int(np.searchsorted(self.offsets, idx, side="right")) - 1
        return self.datasets[ds][idx - int(self.offsets[ds])]


class RandomConcatSampler:
    """Scene-balanced index sampler over a ConcatDataset (sampler.py:5-77):
    draw n_samples_per_subset indices per sub-dataset each epoch, with or
    without replacement, optional whole-epoch shuffle and sample repetition.
    """

    def __init__(
        self,
        concat: ConcatDataset,
        n_samples_per_subset: int,
        subset_replacement: bool = True,
        shuffle: bool = True,
        repeat: int = 1,
        seed: Optional[int] = 66,
    ):
        self.concat = concat
        self.n = n_samples_per_subset
        self.replacement = subset_replacement
        self.shuffle = shuffle
        self.repeat = max(1, repeat)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.concat.datasets) * self.n * self.repeat

    def __iter__(self):
        chunks = []
        for d_idx, d in enumerate(self.concat.datasets):
            lo = int(self.concat.offsets[d_idx])
            hi = int(self.concat.offsets[d_idx + 1])
            if self.replacement:
                idx = self.rng.integers(lo, hi, size=self.n)
            else:
                pool = self.rng.permutation(np.arange(lo, hi))
                idx = pool[: self.n]
                if len(idx) < self.n:  # pad by resampling (sampler.py:51-56)
                    pad = self.rng.integers(lo, hi, size=self.n - len(idx))
                    idx = np.concatenate([idx, pad])
            chunks.append(idx)
        indices = np.concatenate(chunks)
        if self.shuffle:
            indices = self.rng.permutation(indices)
        if self.repeat > 1:
            reps = [indices]
            for _ in range(self.repeat - 1):
                reps.append(self.rng.permutation(indices) if self.shuffle else indices)
            indices = np.concatenate(reps)
        return iter(indices.tolist())


class RenderedViewsPairDataset:
    """Object-centric rendered-views pair sampler (the Objaverse-style
    trainer data source).

    Reference behavior: src/datasets/objaverse.py:26-119 — a class list file
    names per-object directories of `n_views` rendered frames
    ('000.png'..'010.png') with matching '000.npy' pose files; __getitem__
    rejection-samples a view pair until its relative-rotation magnitude
    falls under a rotation bin drawn from {30,30,30,60,60,90} degrees
    (:93-95), and returns grayscale frames + the relative pose + the fixed
    render intrinsics (:47).
    """

    INTRINSIC = np.array([[1120.0, 0, 256], [0, 840, 256], [0, 0, 1]], np.float32)
    ANGULAR_BINS = (30, 30, 30, 60, 60, 90)

    def __init__(self, root_dir: str, class_file: str, n_views: int = 11, seed: int = 0, max_tries: int = 64):
        import os.path as osp

        self.root = root_dir
        self.classes = [c for c in np.loadtxt(class_file, dtype=str).reshape(-1)]
        self.n_views = n_views
        self.rng = random.Random(seed)
        self.max_tries = max_tries

    def __len__(self):
        return len(self.classes)

    def __getitem__(self, idx):
        import os.path as osp

        from pope_tpu.data.readers import read_scannet_grayv2
        from pope_tpu.geometry.pose import rotation_angle_deg
        import jax.numpy as jnp

        d = osp.join(self.root, str(self.classes[idx]))
        for _ in range(self.max_tries):
            i0, i1 = self.rng.sample(range(self.n_views), 2)
            p0 = osp.join(d, f"{i0:03d}.png")
            p1 = osp.join(d, f"{i1:03d}.png")
            if not (osp.exists(p0) and osp.exists(p1)):
                continue
            pose0 = np.load(osp.join(d, f"{i0:03d}.npy"))
            pose1 = np.load(osp.join(d, f"{i1:03d}.npy"))
            if pose0.shape[0] == 3:
                pose0 = np.vstack([pose0, [0, 0, 0, 1]])
            if pose1.shape[0] == 3:
                pose1 = np.vstack([pose1, [0, 0, 0, 1]])
            T_0to1 = pose1 @ np.linalg.inv(pose0)
            r_err = float(
                rotation_angle_deg(jnp.asarray(np.eye(3), jnp.float32), jnp.asarray(T_0to1[:3, :3], jnp.float32))
            )
            bin_deg = self.rng.choice(self.ANGULAR_BINS)
            if r_err <= bin_deg:
                return {
                    "image0": read_scannet_grayv2(p0),
                    "image1": read_scannet_grayv2(p1),
                    "T_0to1": T_0to1.astype(np.float32),
                    "T_1to0": np.linalg.inv(T_0to1).astype(np.float32),
                    "K0": self.INTRINSIC,
                    "K1": self.INTRINSIC,
                    "pair_name": f"{self.classes[idx]}/{i0:03d}_{i1:03d}",
                }
        raise RuntimeError(f"no pair within rotation bins for {d}")
