"""Extraction: run the pipeline and dump per-pair artifacts for regressor
training.

Reference behavior: linemod.py / onepose.py / onepose++.py / ycbv.py —
same pipeline as eval but instead of solving pose, dump
{pre_bbox, mkpts0, mkpts1, pre_K, img0 (prompt crop), img1 (selected crop)}
under <out>/<label>/{pre_bbox,mkpts0,mkpts1,pre_K,img0,img1}/<pair>.{txt,png}
(linemod.py:147-171); pairs with <5 matches are skipped (:142-145).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from pope_tpu.eval.manifest import DATASETS, iter_pairs, load_manifest
from pope_tpu.pipeline.runner import get_executor, pair_key

SUBDIRS = ("pre_bbox", "mkpts0", "mkpts1", "pre_K", "img0", "img1")


def extract_pair(models, paths, spec, out_dir: str, key=None) -> bool:
    """Run the pipeline for one pair and write the dump. Returns True when
    the pair produced >=5 matches and was written."""
    import cv2

    key = key if key is not None else pair_key(paths.pair_name)
    img0 = cv2.cvtColor(cv2.imread(paths.image0), cv2.COLOR_BGR2RGB)
    img1 = cv2.cvtColor(cv2.imread(paths.image1), cv2.COLOR_BGR2RGB)
    K1 = np.loadtxt(paths.k1, delimiter=" ").astype(np.float32)
    K0 = np.loadtxt(paths.k0, delimiter=" ").astype(np.float32)

    executor = get_executor(models, spec.crop_size)
    img0_u8 = jnp.asarray(img0, jnp.uint8)
    img1_u8 = jnp.asarray(img1, jnp.uint8)
    ref_cls = executor.prompt_cls_raw(img0_u8[None])[0]
    amg_res = models.amg.generate_batch(img1_u8[None], keep_logits=True)[0]
    result = executor.estimate_pair(
        img0_u8,
        img1_u8,
        jnp.asarray(K0),
        jnp.asarray(K1),
        amg_res,
        ref_cls,
        key,
    )

    ok = np.asarray(result.match_valid)
    mkpts0 = np.asarray(result.mkpts0)[ok]
    mkpts1 = np.asarray(result.mkpts1)[ok]
    if len(mkpts0) < 5:  # linemod.py:142-145
        return False

    label = paths.pair_name.split("/")[0]
    points_name = paths.pair_name.split("/")[-1]
    base = Path(out_dir) / label
    for sub in SUBDIRS:
        (base / sub).mkdir(parents=True, exist_ok=True)

    np.savetxt(base / "pre_bbox" / f"{points_name}.txt", np.asarray(result.pre_bbox))
    np.savetxt(base / "mkpts0" / f"{points_name}.txt", mkpts0)
    np.savetxt(base / "mkpts1" / f"{points_name}.txt", mkpts1)
    np.savetxt(base / "pre_K" / f"{points_name}.txt", np.asarray(result.pre_K))
    # prompt crop: the reference saves the (cropped) prompt and winning target
    # crops (linemod.py:121-130); we regenerate the winner's crop
    from pope_tpu.geometry.affine import get_image_crop_resize

    crop1, _ = get_image_crop_resize(
        jnp.asarray(img1, jnp.float32), jnp.asarray(result.pre_bbox), (spec.crop_size, spec.crop_size)
    )
    cv2.imwrite(str(base / "img0" / f"{points_name}.png"), cv2.cvtColor(img0, cv2.COLOR_RGB2BGR))
    cv2.imwrite(
        str(base / "img1" / f"{points_name}.png"),
        cv2.cvtColor(np.asarray(crop1).astype(np.uint8), cv2.COLOR_RGB2BGR),
    )
    return True


def extract_dataset(args):
    """CLI entry: run extraction over a dataset manifest."""
    from pope_tpu.pipeline import load_models

    models = load_models(
        sam_checkpoint=args.sam_checkpoint,
        sam_type=args.sam_type,
        dinov2_checkpoint=args.dinov2_checkpoint,
        matcher_checkpoint=args.matcher_checkpoint,
    )
    spec = DATASETS[args.dataset]
    manifest = load_manifest(args.pairs_dir, spec)
    n = written = 0
    for paths in iter_pairs(args.data_root, spec, manifest):
        if args.max_pairs is not None and n >= args.max_pairs:
            break
        written += int(extract_pair(models, paths, spec, args.out_dir))
        n += 1
    print(f"extracted {written}/{n} pairs -> {args.out_dir}")
