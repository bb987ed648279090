"""The per-pair POPE pipeline: segment -> retrieve -> match -> solve.

Reference behavior: the eval driver loop (eval_linemod_json.py:51-168):
  - AMG masks over the target image (:69)
  - per mask: expand bbox by compact_percent=0.3, crop + intrinsics update,
    DINOv2 cls-token cosine vs the prompt image, keep top-3 (:74-101)
  - matcher between grayscale prompt and each top-3 crop; the crop with the
    most matches at mconf > 0.9 wins (:107-122)
  - essential-matrix RANSAC on the winner's matches (:159)

TPU-native redesign: the per-mask loop becomes one vmapped crop + one
batched DINOv2 forward over the full mask capacity (the reference runs one
un-batched forward per mask — its biggest serialization, SURVEY.md §3.1);
the top-3 matcher runs as a single batch-3 matcher call; candidate selection
is branch-free argmax; the solver is the on-chip RANSAC. Everything between
image decode and metric aggregation is jitted with static shapes.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pope_tpu.geometry.affine import get_K_crop_resize, get_image_crop_resize
from pope_tpu.models.dinov2.preprocess import IMAGENET_MEAN, IMAGENET_STD, cls_token_cosine
from pope_tpu.solver import estimate_pose_ransac


class PipelineExecutor:
    """Stage-jitted pipeline: retrieval / matching / solving compile as
    separate cached programs (a single fused estimate_pair program tops
    10 minutes of XLA compile at SAM scale; stage splits compile in seconds
    each and the host handoffs between stages are microseconds)."""

    def __init__(self, models, crop_size: int = 256):
        self.models = models
        self.crop_size = crop_size
        cfg = models.config

        # model weights are threaded as jit ARGUMENTS — closing over them
        # bakes hundreds of MB of constants into the HLO, which both bloats
        # compiles and defeats the persistent compile cache
        def retrieve(dinov2_vars, image1, boxes_xywh, valid, K1, ref_cls):
            return retrieve_top_k(
                models, _to_rgb01(image1), boxes_xywh, valid, K1, ref_cls,
                top_k=cfg.top_k, crop_size=crop_size, dinov2_variables=dinov2_vars,
            )

        def retrieve_folded(dinov2_vars, image1, boxes_xywh, valid, K1, ref_img):
            # prompt cls computed inside the candidate forward (ref_img is
            # the preprocessed 196x196 prompt; see retrieve_top_k ref_img)
            return retrieve_top_k(
                models, _to_rgb01(image1), boxes_xywh, valid, K1, None,
                top_k=cfg.top_k, crop_size=crop_size, dinov2_variables=dinov2_vars,
                ref_img=ref_img,
            )

        def match(matcher_vars, image0_rgb01, crops):
            ref_gray = _rgb01_to_gray(_to_rgb01(image0_rgb01))
            crop_grays = jax.vmap(_rgb01_to_gray)(crops)
            res, strong = match_and_score(
                models, ref_gray, crop_grays, cfg.matcher.mconf_strong_thr,
                matcher_variables=matcher_vars,
            )
            best = jnp.argmax(strong)
            return (
                res.mkpts0[best], res.mkpts1[best], res.mconf[best],
                res.valid[best], strong[best], best, res.n_dropped[best],
            )

        def solve(mkpts0, mkpts1, K0, pre_K, valid, key):
            return estimate_pose_ransac(
                mkpts0, mkpts1, K0, pre_K, valid, key,
                thresh_px=cfg.ransac_thresh_px, n_rounds=cfg.ransac_rounds,
            )

        def select_best(crop_Ks, boxes, top_idx, best):
            # winner's intrinsics + box. MUST be jitted: an eager gather on
            # the axon backend is a whole remote compile + dispatch
            return crop_Ks[best], boxes[top_idx[best]]

        def prompt_fwd(dinov2_vars, ref_in):
            # the prompt image's cls token (eval_linemod_json.py:64-65) —
            # jitted so the production driver never runs an eager forward
            return models.dinov2.apply(dinov2_vars, ref_in)["x_norm_clstoken"]

        def prompt_fwd_raw(dinov2_vars, imgs):
            # full path from raw (B, H, W, 3) frames: resize/crop/normalize
            # (dinov2_utils.py:55-78 center_crop path) fused into the forward
            from pope_tpu.models.dinov2.preprocess import preprocess_image

            imgs = _to_rgb01(imgs) * 255.0  # preprocess_image expects [0,255]
            ref_in = jax.vmap(lambda im: preprocess_image(im, center_crop=True)[0])(imgs)
            return models.dinov2.apply(dinov2_vars, ref_in)["x_norm_clstoken"]

        self._retrieve_fn = retrieve
        self._retrieve_folded_fn = retrieve_folded
        self._match_fn = match
        self._solve_fn = solve
        self._select_fn = select_best
        jr = jax.jit(retrieve)
        jm = jax.jit(match)
        jp = jax.jit(prompt_fwd)
        jpr = jax.jit(prompt_fwd_raw)
        self._retrieve = lambda *a: jr(models.dinov2_variables, *a)
        self._match = lambda *a: jm(models.matcher_variables, *a)
        self._solve = jax.jit(solve)
        self._select = jax.jit(select_best)
        self._prompt = lambda ref_in: jp(models.dinov2_variables, ref_in)
        self._prompt_raw = lambda imgs: jpr(models.dinov2_variables, imgs)
        self._batched_runs = {}

    def prompt_cls(self, ref_in):
        """(B, 196, 196, 3) preprocessed prompt images -> (B, D) cls tokens."""
        return self._prompt(jnp.asarray(ref_in))

    def prompt_cls_raw(self, imgs):
        """(B, H, W, 3) raw uint8/float[0,1] frames -> (B, D) cls tokens;
        the resize/crop/normalize runs on device inside one program."""
        return self._prompt_raw(imgs)

    def batched(self, mesh=None):
        """The vmapped multi-pair runner (built once per mesh; jit
        re-specializes per batch shape). Production shape: prompt forward
        folded into the retrieval batch (pass ref_cls_b=None). mesh: optional
        dp mesh — the fused program runs SPMD-sharded over the pair axis."""
        if mesh not in self._batched_runs:
            self._batched_runs[mesh] = self.build_batched(0, mesh=mesh, fold_prompt=True)
        return self._batched_runs[mesh]

    def build_batched(self, n_pairs: int = 0, mesh=None, fold_prompt: bool = False):
        """The multi-pair retrieve->match->select->solve as ONE fused jitted
        program. Batching the pair axis amortizes the per-dispatch overhead
        and the small-matrix linalg that dominates single-pair latency; the
        fusion collapses 4 stage dispatches (each a tunnel round trip on this
        deployment) into one, and compiles in ~2.5 min once (persistent
        cache). The SAM encoder stays out (including it blows the XLA
        compile budget past 10 min, ROADMAP).

        mesh: optional jax.sharding.Mesh with a 'dp' axis — inputs are
        sharded over dp (the reference's only scalable axis is this pair
        loop, SURVEY §2.5 / BASELINE.json config #5); the SPMD partitioner
        replicates weights and splits every stage across chips. B must be
        divisible by mesh.shape['dp'].

        fold_prompt: compute the prompt cls INSIDE this program (preprocess
        fused, prompt appended to the retrieval crop batch) — callers pass
        ref_cls_b=None. Saves the standalone B-image prompt dispatch; the
        production runner uses this shape."""
        models = self.models

        def run_fused(dv, mv, image0_b, image1_b, K0_b, K1_b, amg_boxes_b, amg_valid_b, ref_cls_b, keys, amg_dropped_b=None):
            if fold_prompt:
                from pope_tpu.models.dinov2.preprocess import preprocess_image

                imgs = _to_rgb01(image0_b) * 255.0
                ref_in = jax.vmap(
                    lambda im: preprocess_image(im, center_crop=True)[0]
                )(imgs)  # (B, 196, 196, 3)
                top_idx, sim, crops, crop_Ks, boxes = jax.vmap(
                    self._retrieve_folded_fn, in_axes=(None, 0, 0, 0, 0, 0)
                )(dv, image1_b, amg_boxes_b, amg_valid_b, K1_b, ref_in)
            else:
                top_idx, sim, crops, crop_Ks, boxes = jax.vmap(
                    self._retrieve_fn, in_axes=(None, 0, 0, 0, 0, 0)
                )(dv, image1_b, amg_boxes_b, amg_valid_b, K1_b, ref_cls_b)
            mkpts0, mkpts1, mconf, mvalid, n_strong, best, match_dropped = jax.vmap(
                self._match_fn, in_axes=(None, 0, 0)
            )(mv, image0_b, crops)
            pre_K, pre_bbox = jax.vmap(self._select_fn)(crop_Ks, boxes, top_idx, best)
            sol = jax.vmap(self._solve_fn)(mkpts0, mkpts1, K0_b, pre_K, mvalid, keys)
            B = mkpts0.shape[0]
            if amg_dropped_b is None:
                amg_dropped_b = jnp.zeros((B,), jnp.int32)
            res = PairResult(
                R=sol.R, t=sol.t, ok=sol.ok, pre_bbox=pre_bbox, pre_K=pre_K,
                mkpts0=mkpts0, mkpts1=mkpts1, mconf=mconf, match_valid=mvalid,
                n_strong=n_strong, sim_scores=sim,
                n_dropped_masks=amg_dropped_b, n_dropped_matches=match_dropped,
            )
            # d2h-friendly packing: the tunnel charges a ~40ms floor per
            # fetched leaf, so the record consumers pull TWO arrays instead
            # of nine (unpacked host-side by runner._unpack_records)
            small = jnp.concatenate(
                [
                    sol.R.reshape(B, 9), sol.t,
                    sol.ok.astype(jnp.float32)[:, None], pre_bbox,
                    pre_K.reshape(B, 9),
                    n_strong.astype(jnp.float32)[:, None],
                    amg_dropped_b.astype(jnp.float32)[:, None],
                    match_dropped.astype(jnp.float32)[:, None],
                ],
                axis=-1,
            )  # (B, 29)
            matches = jnp.concatenate(
                [mkpts0, mkpts1, mconf[..., None], mvalid.astype(jnp.float32)[..., None]],
                axis=-1,
            )  # (B, M, 6)
            return res, small, matches

        jrun = jax.jit(run_fused)

        def run(*args, packed: bool = False):
            res, small, matches = jrun(
                models.dinov2_variables, models.matcher_variables, *args
            )
            return (small, matches) if packed else res

        # AOT handle for introspection (scripts/roofline.py pulls XLA's
        # flops/bytes cost analysis off the compiled fused program)
        run.jitted = jrun

        if mesh is None:
            return run

        def run_dp(*args, packed: bool = False):
            def put(x):
                if x is None:  # fold_prompt passes ref_cls_b=None
                    return None
                x = jnp.asarray(x)
                spec = P(*(["dp"] + [None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))

            with mesh:
                return run(*(put(a) for a in args), packed=packed)

        run_dp.jitted = jrun
        return run_dp

    def estimate_pair(self, image0_rgb01, image1_rgb01, K0, K1, amg_result, ref_cls, key) -> "PairResult":
        top_idx, sim, crops, crop_Ks, boxes = self._retrieve(
            image1_rgb01, amg_result.boxes_xywh, amg_result.valid, K1, ref_cls
        )
        mkpts0, mkpts1, mconf, mvalid, n_strong, best, match_dropped = self._match(
            jnp.asarray(image0_rgb01), crops
        )
        pre_K, pre_bbox = self._select(crop_Ks, boxes, top_idx, best)
        sol = self._solve(mkpts0, mkpts1, K0, pre_K, mvalid, key)
        return PairResult(
            R=sol.R, t=sol.t, ok=sol.ok, pre_bbox=pre_bbox, pre_K=pre_K,
            mkpts0=mkpts0, mkpts1=mkpts1, mconf=mconf, match_valid=mvalid,
            n_strong=n_strong, sim_scores=sim,
            n_dropped_masks=getattr(amg_result, "n_dropped", None),
            n_dropped_matches=match_dropped,
        )


class PairResult(NamedTuple):
    R: jnp.ndarray  # (3, 3) relative rotation
    t: jnp.ndarray  # (3,) unit translation
    ok: jnp.ndarray  # () bool solver success
    pre_bbox: jnp.ndarray  # (4,) selected XYXY box in image1 coords
    pre_K: jnp.ndarray  # (3, 3) intrinsics of the selected crop
    mkpts0: jnp.ndarray  # (M, 2) matches in image0
    mkpts1: jnp.ndarray  # (M, 2) matches in the selected crop
    mconf: jnp.ndarray  # (M,)
    match_valid: jnp.ndarray  # (M,) bool
    n_strong: jnp.ndarray  # () winning crop's strong-match count
    sim_scores: jnp.ndarray  # (top_k,) retrieval cosine scores
    # capacity-saturation telemetry ("no silent caps"): candidates/matches
    # the static mask_capacity / match_capacity truncated for this pair
    n_dropped_masks: jnp.ndarray = None  # ()
    n_dropped_matches: jnp.ndarray = None  # ()


def _dino_box_window(box_xyxy):
    """The sub-box of `box` whose direct affine warp to 196x196 equals
    crop(box -> 256) -> CenterCrop(196) (the dinov2_utils.set_torch_image
    center_crop path): rows/cols 30..225 of the 256-crop are the affine
    samples of the box shrunk to its [30/256, 226/256] span. Exact — both
    are the same linear map of the source image, so the per-pixel sample
    positions coincide for any resampling convention."""
    x0, y0, x1, y1 = box_xyxy[0], box_xyxy[1], box_xyxy[2], box_xyxy[3]
    w, h = x1 - x0, y1 - y0
    lo, hi = 30.0 / 256.0, 226.0 / 256.0
    return jnp.stack([x0 + lo * w, y0 + lo * h, x0 + hi * w, y0 + hi * h])


def retrieve_top_k(models, image1_rgb01, boxes_xywh, valid, K1, ref_cls, top_k=3, crop_size=256, dinov2_variables=None, ref_img=None):
    """Crop every AMG candidate, score against the prompt cls token, return
    the top-k candidates. All candidates run as ONE batched DINOv2 forward.

    Args:
      image1_rgb01: (H, W, 3) float target image in [0, 1].
      boxes_xywh: (C, 4) candidate boxes; valid: (C,) bool.
      K1: (3, 3); ref_cls: (D,) prompt cls token, or None when ref_img given.
      ref_img: optional (196, 196, 3) preprocessed prompt image — appended
        as a C+1'th row of the candidate forward so the prompt cls computes
        inside the SAME DINOv2 dispatch (folds away the standalone B-image
        prompt program of the unfolded path; same math, one batch).
    Returns:
      (top_idx (k,), scores (k,), crops (k, S, S, 3), crop_Ks (k, 3, 3),
       boxes_xyxy (C, 4) the compact-expanded boxes)
    """
    compact = models.config.compact_percent

    def expand(b):
        # eval_linemod_json.py:76-84 with int truncation at the host edge
        x0, y0, w, h = b[0], b[1], b[2], b[3]
        dx = jnp.floor(w * compact)
        dy = jnp.floor(h * compact)
        return jnp.stack([x0 - dx, y0 - dy, x0 + w + dx, y0 + h + dy])

    boxes = jax.vmap(expand)(boxes_xywh)  # (C, 4) xyxy

    # score ALL candidates at the DINOv2 input resolution directly: one
    # 196x196 warp per box replaces crop(256) -> resize -> CenterCrop(196)
    # exactly (_dino_box_window) — 41% fewer resampled pixels per candidate
    # and no full-capacity (C, S, S, 3) crop tensor; the matcher-resolution
    # crops are produced only for the k winners below
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def dino_crop(box):
        crop, _ = get_image_crop_resize(image1_rgb01, _dino_box_window(box), (196, 196))
        return (crop - mean) / std

    dino_in = jax.vmap(dino_crop)(boxes)  # (C, 196, 196, 3)
    if ref_img is not None:
        dino_in = jnp.concatenate([dino_in, ref_img[None]], axis=0)  # (C+1, ...)
    dv = models.dinov2_variables if dinov2_variables is None else dinov2_variables
    out = models.dinov2.apply(dv, dino_in)
    cls = out["x_norm_clstoken"]  # (C[+1], D)
    if ref_img is not None:
        ref_cls, cls = cls[-1], cls[:-1]
    scores = cls_token_cosine(ref_cls[None], cls)  # (C,)
    scores = jnp.where(valid, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(scores, top_k)

    def crop_one(box):
        crop, _ = get_image_crop_resize(image1_rgb01, box, (crop_size, crop_size))
        K_crop, _ = get_K_crop_resize(box, K1, (crop_size, crop_size))
        return crop, K_crop

    crops, crop_Ks = jax.vmap(crop_one)(boxes[top_idx])  # (k, S, S, 3), (k, 3, 3)
    return top_idx, top_scores, crops, crop_Ks, boxes


def match_and_score(models, ref_gray, crop_grays, strong_thr=0.9, matcher_variables=None):
    """Run the matcher between the prompt and k candidate crops in one batch;
    score each by its count of matches with mconf > strong_thr
    (eval_linemod_json.py:112-119)."""
    mv = models.matcher_variables if matcher_variables is None else matcher_variables
    # single-prompt backbone runs once inside the matcher (B0=1 broadcast)
    res = models.matcher.apply(mv, ref_gray[None, ..., None], crop_grays[..., None])
    strong = res.strong_match_count(strong_thr)  # (k,)
    return res, strong


def _rgb01_to_gray(img_rgb01):
    """ITU-R 601 luma — identical coefficients to cv2.cvtColor BGR2GRAY."""
    return (
        0.299 * img_rgb01[..., 0] + 0.587 * img_rgb01[..., 1] + 0.114 * img_rgb01[..., 2]
    )


def _to_rgb01(img):
    """Accept uint8 [0,255] or float [0,1] images; cast/scale inside jit.

    The production path ships uint8 over the host->device link (the tunnel
    runs at ~6 MB/s here; float32 frames quadruple the upload and dominated
    the whole pipeline) and converts on device."""
    if jnp.issubdtype(jnp.asarray(img).dtype, jnp.integer):
        return jnp.asarray(img, jnp.float32) / 255.0
    return jnp.asarray(img)


def estimate_pair(
    models,
    image0_rgb01,
    image1_rgb01,
    K0,
    K1,
    amg_result,
    ref_cls,
    key,
    crop_size: int = 256,
) -> PairResult:
    """Full retrieve -> match -> solve for one (prompt, target) pair, given
    precomputed AMG candidates and the prompt's cls token. jit-safe."""
    cfg = models.config
    top_idx, sim, crops, crop_Ks, boxes = retrieve_top_k(
        models,
        image1_rgb01,
        amg_result.boxes_xywh,
        amg_result.valid,
        K1,
        ref_cls,
        top_k=cfg.top_k,
        crop_size=crop_size,
    )
    ref_gray = _rgb01_to_gray(image0_rgb01)
    crop_grays = jax.vmap(_rgb01_to_gray)(crops)
    res, strong = match_and_score(models, ref_gray, crop_grays, cfg.matcher.mconf_strong_thr)

    best = jnp.argmax(strong)  # eval_linemod_json.py:150
    mkpts0 = res.mkpts0[best]
    mkpts1 = res.mkpts1[best]
    mconf = res.mconf[best]
    mvalid = res.valid[best]
    pre_K = crop_Ks[best]
    pre_bbox = boxes[top_idx[best]]

    sol = estimate_pose_ransac(
        mkpts0, mkpts1, K0, pre_K, mvalid, key,
        thresh_px=cfg.ransac_thresh_px, n_rounds=cfg.ransac_rounds,
    )
    return PairResult(
        R=sol.R,
        t=sol.t,
        ok=sol.ok,
        pre_bbox=pre_bbox,
        pre_K=pre_K,
        mkpts0=mkpts0,
        mkpts1=mkpts1,
        mconf=mconf,
        match_valid=mvalid,
        n_strong=strong[best],
        sim_scores=sim,
        n_dropped_masks=getattr(amg_result, "n_dropped", None),
        n_dropped_matches=res.n_dropped[best],
    )
