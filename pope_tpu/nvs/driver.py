"""Novel-view rendering driver over LINEMOD-layout sequences.

Mirrors src/novel_view_render.py's data flow: read color/{i}.png +
poses_ba/{i}.txt + intrin_ba/{i}.txt for a set of source ids (:39-68),
derive the depth range from the poses' z-translation (:50,:105
[0.6*min, 1.5*max]), fit the scene, render each target id, and write
`{label}_gt_pose_{idx}.jpg` (render) next to `{label}_gt_{idx}.jpg`
(ground truth) (:143-144), reporting PSNR/SSIM (gnt_utils metrics surface),
plus LPIPS when the released weights are supplied (utils/lpips.py; the
reference's own lpips import is external/broken there, :13).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

from pope_tpu.nvs.nerf import (
    NerfConfig, init_nerf, make_rays, render_image, train_nerf,
)
from pope_tpu.utils.image_metrics import psnr, ssim
from pope_tpu.utils.logging import get_logger

logger = get_logger("pope_tpu.nvs")


def _load_view(root: str, idx: int):
    import cv2

    rgb = cv2.imread(os.path.join(root, "color", f"{idx}.png"), cv2.IMREAD_COLOR)
    if rgb is None:
        raise FileNotFoundError(f"{root}/color/{idx}.png")
    rgb = rgb[..., ::-1].astype(np.float32) / 255.0
    pose = np.loadtxt(os.path.join(root, "poses_ba", f"{idx}.txt"))
    K = np.loadtxt(os.path.join(root, "intrin_ba", f"{idx}.txt"))
    return rgb, pose, K


def render_novel_views(
    seq_root: str,
    source_ids: Sequence[int],
    target_ids: Optional[Sequence[int]] = None,
    out_dir: str = ".",
    label: Optional[str] = None,
    cfg: NerfConfig = NerfConfig(),
    train_steps: int = 2000,
    downscale: int = 1,
    seed: int = 0,
    lpips_params=None,
):
    """Fit the sequence's source views, render targets, write jpgs + metrics.
    Returns [(idx, psnr, ssim), ...], with an lpips column appended when
    `lpips_params` (utils.lpips tree) is given."""
    import cv2

    label = label or os.path.basename(os.path.dirname(seq_root.rstrip("/")))
    views = [_load_view(seq_root, i) for i in source_ids]
    zs = np.array([p[2][3] for _, p, _ in views])
    near, far = float(zs.min() * 0.6), float(zs.max() * 1.5)

    all_o, all_d, all_rgb = [], [], []
    for rgb, pose, K in views:
        if downscale > 1:
            h, w = rgb.shape[0] // downscale, rgb.shape[1] // downscale
            rgb = cv2.resize(rgb, (w, h), interpolation=cv2.INTER_AREA)
            K = K.copy()
            K[:2] /= downscale
        o, d = make_rays(K, pose, rgb.shape[:2])
        all_o.append(o.reshape(-1, 3))
        all_d.append(d.reshape(-1, 3))
        all_rgb.append(rgb.reshape(-1, 3))
    import jax.numpy as jnp

    rays_o = jnp.asarray(np.concatenate(all_o))
    rays_d = jnp.asarray(np.concatenate(all_d))
    rgbs = jnp.asarray(np.concatenate(all_rgb).astype(np.float32))
    logger.info(
        "fitting %s: %d source views, %d rays, depth range [%.3f, %.3f]",
        label, len(views), rays_o.shape[0], near, far,
    )

    model, state = init_nerf(cfg, jax.random.PRNGKey(seed))
    state = train_nerf(
        model, state, rays_o, rays_d, rgbs, near, far, train_steps,
        jax.random.PRNGKey(seed + 1), log_every=max(train_steps // 10, 1),
    )

    os.makedirs(out_dir, exist_ok=True)
    results = []
    for idx in target_ids if target_ids is not None else source_ids:
        rgb, pose, K = _load_view(seq_root, idx)
        if downscale > 1:
            h, w = rgb.shape[0] // downscale, rgb.shape[1] // downscale
            rgb = cv2.resize(rgb, (w, h), interpolation=cv2.INTER_AREA)
            K = K.copy()
            K[:2] /= downscale
        render = render_image(model, state.params, K, pose, rgb.shape[:2], near, far)
        p, s = psnr(render, rgb), ssim(render, rgb)
        if lpips_params is not None:
            from pope_tpu.utils.lpips import lpips_distance_jit

            lp = float(lpips_distance_jit(
                lpips_params, np.asarray(render)[None], rgb[None])[0])
            results.append((idx, p, s, lp))
            logger.info("view %d: psnr=%.2f ssim=%.3f lpips=%.4f", idx, p, s, lp)
        else:
            results.append((idx, p, s))
            logger.info("view %d: psnr=%.2f ssim=%.3f", idx, p, s)
        cv2.imwrite(
            os.path.join(out_dir, f"{label}_gt_pose_{idx}.jpg"),
            (render[..., ::-1] * 255).astype(np.uint8),
        )
        cv2.imwrite(
            os.path.join(out_dir, f"{label}_gt_{idx}.jpg"),
            (rgb[..., ::-1] * 255).astype(np.uint8),
        )
    return results


def render_main(args):
    """CLI entry (`pope-tpu render-novel-view`)."""
    source_ids = [int(s) for s in args.source_ids.split(",")]
    target_ids = (
        [int(s) for s in args.target_ids.split(",")] if args.target_ids else None
    )
    lpips_params = None
    if getattr(args, "lpips_alexnet", None) or getattr(args, "lpips_lins", None):
        if not (args.lpips_alexnet and args.lpips_lins):
            raise SystemExit("--lpips-alexnet and --lpips-lins must be given together")
        from pope_tpu.utils.lpips import lpips_from_torch_files

        lpips_params = lpips_from_torch_files(args.lpips_alexnet, args.lpips_lins)
    render_novel_views(
        args.seq_root, source_ids, target_ids, out_dir=args.out_dir,
        label=args.label, train_steps=args.train_steps,
        downscale=args.downscale, seed=args.seed, lpips_params=lpips_params,
    )
