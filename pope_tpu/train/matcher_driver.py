"""Matcher (LoFTR) training driver: multi-scene datasets -> scene-balanced
sampling -> jitted (dp, tp)-sharded train steps -> per-epoch validation with
pose-auc aggregation -> auc@10-monitored top-k checkpointing with resume.

Behavioral spec: scripts/train.py:57-123 (lr/warmup batch-size scaling
:71-77; ModelCheckpoint monitor='auc@10' save_top_k=5 mode='max' save_last
:94-97) and src/lightning/lightning_loftr.py:60-203 (_trainval_inference
:82-93, validation epi_errs + R_errs/t_errs :95-110, epoch-end gathering +
aggregate_metrics :158-203). The reference's own monitor is broken — its
POPE-modified aggregate_metrics (src/utils/metrics.py:181-215) emits
'R:auc@NN'/'t:auc@NN' but validation_epoch_end reads 'auc@{5,10,20}' — so
this driver restores the ORIGINAL LoFTR monitor semantics those keys came
from: auc of max(R_err, t_err) at 5/10/20 degrees.

TPU-native shape: the per-step machinery is one jitted program
(train.trainer), validation is one jitted forward+RANSAC program per batch,
and multi-chip runs the same programs over a (dp, tp) mesh with dp-sharded
batches (SPMD collectives replace the reference's DDP/NCCL allreduce).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import shutil
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pope_tpu.data.loader import ThreadedLoader
from pope_tpu.data.scenes import ConcatDataset, RandomConcatSampler
from pope_tpu.train.loss import LossConfig
from pope_tpu.train.optim import OptimConfig, build_optimizer
from pope_tpu.train.trainer import (
    MatcherTrainState,
    init_matcher_train_state,
    make_sharded_train_step,
    matcher_train_step,
)
from pope_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from pope_tpu.utils.logging import get_logger
from pope_tpu.utils.metrics import aggregate_metrics, error_auc

logger = get_logger("pope_tpu.train_matcher")


@dataclasses.dataclass(frozen=True)
class TrainMatcherConfig:
    """Trainer hyperparameters (src/config/default.py:104-155 defaults)."""

    canonical_bs: int = 64  # TRAINER.CANONICAL_BS
    canonical_lr: float = 6e-3  # TRAINER.CANONICAL_LR
    warmup_steps: int = 4800  # TRAINER.WARMUP_STEP, pre-scaling
    warmup_ratio: float = 0.0
    grad_clip: float = 0.5  # TRAINER.GRADIENT_CLIPPING
    scheduler: str = "MultiStepLR"
    mslr_milestones: Sequence[int] = (3, 6, 9, 12)  # epochs (MSLR_MILESTONES)
    mslr_gamma: float = 0.5
    epochs: int = 30
    n_samples_per_subset: int = 200  # TRAINER.N_SAMPLES_PER_SUBSET
    epi_err_thr: float = 5e-4  # TRAINER.EPI_ERR_THR (5e-4 ScanNet, 1e-4 MegaDepth)
    monitor: str = "auc@10"  # ModelCheckpoint(monitor='auc@10', mode='max')
    save_top_k: int = 5
    seed: int = 66  # TRAINER.SEED
    # validation RANSAC budget (tests shrink it; the solver default matches
    # the eval pipeline)
    val_n_hyps: int = 2048
    val_n_rounds: int = 3
    val_thresh_px: float = 0.5  # TRAINER.RANSAC_PIXEL_THR for pose estimation


def collate_pairs(items: List[dict]) -> Dict[str, np.ndarray]:
    """Stack scene-dataset items into the trainer's batch layout.

    Dataset items carry image0/image1 as (1, h, w) grayscale (reader
    convention); the matcher is NHWC. ScanNet items share one 'K'
    (scannet.py stores per-scene intrinsics); MegaDepth items carry
    K0/K1 + resize scales.
    """
    def stack(key, alt=None):
        return np.stack([it[key if key in it else alt] for it in items])

    imgs0 = stack("image0").transpose(0, 2, 3, 1).astype(np.float32)
    imgs1 = stack("image1").transpose(0, 2, 3, 1).astype(np.float32)
    batch = {
        "image0": imgs0,
        "image1": imgs1,
        "depth0": stack("depth0").astype(np.float32),
        "depth1": stack("depth1").astype(np.float32),
        "T_0to1": stack("T_0to1").astype(np.float32),
        "T_1to0": stack("T_1to0").astype(np.float32),
        "K0": stack("K0", "K").astype(np.float32),
        "K1": stack("K1", "K").astype(np.float32),
    }
    if "scale0" in items[0]:
        batch["scale0"] = stack("scale0").astype(np.float32)
        batch["scale1"] = stack("scale1").astype(np.float32)
    return batch


def pair_names(items: List[dict]) -> List[str]:
    return [it.get("pair_name", "?") for it in items]


def make_val_step(matcher, cfg: TrainMatcherConfig):
    """One jitted validation program per batch: matcher forward (inference
    mode) -> per-match symmetric epipolar errors vs GT pose -> RANSAC
    essential solve -> R/t angular errors (lightning_loftr.py:95-110,
    _compute_metrics). Everything stays on device; only the per-batch error
    tensors come home."""
    from pope_tpu.geometry.epipolar import compute_symmetric_epipolar_errors
    from pope_tpu.geometry.pose import relative_pose_error
    from pope_tpu.solver.ransac import estimate_pose_ransac

    def step(params, batch_stats, batch, keys):
        res = matcher.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image0"], batch["image1"],
        )
        # matches live in resized-image pixels; errors are computed against
        # the ORIGINAL intrinsics, so scale back first (megadepth.py scales)
        B = batch["image0"].shape[0]
        s0 = batch.get("scale0", jnp.ones((B, 2)))[:, None]
        s1 = batch.get("scale1", jnp.ones((B, 2)))[:, None]
        mk0 = res.mkpts0 * s0
        mk1 = res.mkpts1 * s1
        epi = jax.vmap(compute_symmetric_epipolar_errors)(
            batch["T_0to1"], mk0, mk1, batch["K0"], batch["K1"]
        )

        def pose_errs(T_0to1, k0, k1, K0, K1, valid, key):
            sol = estimate_pose_ransac(
                k0, k1, K0, K1, valid, key,
                thresh_px=cfg.val_thresh_px,
                n_hyps=cfg.val_n_hyps,
                n_rounds=cfg.val_n_rounds,
            )
            t_err, r_err = relative_pose_error(T_0to1, sol.R, sol.t)
            # failed solves count as maximal error (the eval drivers' 90deg
            # penalty convention, eval_linemod_json.py:150-153)
            r_err = jnp.where(sol.ok, r_err, 90.0)
            t_err = jnp.where(sol.ok, t_err, 90.0)
            return r_err, t_err, sol.inliers

        r_errs, t_errs, inliers = jax.vmap(pose_errs)(
            batch["T_0to1"], mk0, mk1, batch["K0"], batch["K1"], res.valid, keys
        )
        return {
            "epi_errs": epi,
            "match_valid": res.valid,
            "R_errs": r_errs,
            "t_errs": t_errs,
            "inliers": inliers,
        }

    return jax.jit(step)


def validate(
    matcher,
    state: MatcherTrainState,
    val_ds,
    cfg: TrainMatcherConfig,
    batch_size: int,
    val_step=None,
    seed: int = 0,
    put=None,
) -> Dict[str, float]:
    """Full-val-set metric pass. Returns the aggregate_metrics table PLUS
    the checkpoint monitors: 'auc@{5,10,20}' = auc of max(R_err, t_err)
    (original-LoFTR semantics the reference's monitor key comes from)."""
    val_step = val_step or make_val_step(matcher, cfg)
    put = put or (lambda b: b)
    metrics = {"identifiers": [], "epi_errs": [], "R_errs": [], "t_errs": []}
    n = len(val_ds)
    for lo in range(0, n, batch_size):
        idx = list(range(lo, min(lo + batch_size, n)))
        n_real = len(idx)
        idx = idx + [idx[-1]] * (batch_size - n_real)  # pad ragged tail
        items = [val_ds[i] for i in idx]
        batch = put(collate_pairs(items))
        keys = jax.random.split(jax.random.PRNGKey(seed + lo), batch_size)
        out = jax.device_get(val_step(state.params, state.batch_stats, batch, keys))
        for b in range(n_real):
            metrics["identifiers"].append(pair_names(items)[b])
            metrics["epi_errs"].append(out["epi_errs"][b][out["match_valid"][b]])
            metrics["R_errs"].append(float(out["R_errs"][b]))
            metrics["t_errs"].append(float(out["t_errs"][b]))
    agg = aggregate_metrics(metrics, cfg.epi_err_thr)
    pose_err = np.maximum(np.asarray(metrics["R_errs"]), np.asarray(metrics["t_errs"]))
    for thr, v in zip((5, 10, 20), error_auc("Rt", pose_err, [5, 10, 20]).values()):
        agg[f"auc@{thr}"] = v
    return agg


class TopKCheckpointer:
    """ModelCheckpoint(monitor, save_top_k, mode='max', save_last) analogue
    (scripts/train.py:94-97) on orbax directories + a json index.

    Layout: <dir>/last (always newest, holds resume metadata), <dir>/<name>
    for each of the k best, <dir>/index.json recording scores + the epoch
    counter so training resumes mid-schedule."""

    def __init__(self, ckpt_dir: str, monitor: str = "auc@10", top_k: int = 5):
        self.dir = ckpt_dir
        self.monitor = monitor
        self.top_k = top_k
        self.index = {"best": [], "epoch": 0, "monitor": monitor}
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, "index.json")
        if os.path.exists(path):
            with open(path) as f:
                self.index = json.load(f)

    def _write_index(self):
        with open(os.path.join(self.dir, "index.json"), "w") as f:
            json.dump(self.index, f, indent=1)

    def save(self, state: MatcherTrainState, epoch: int, val_metrics: Dict[str, float]):
        score = float(val_metrics[self.monitor])
        # filename pattern '{epoch}-{auc@5:.3f}-{auc@10:.3f}-{auc@20:.3f}'
        name = "epoch={}-auc5={:.3f}-auc10={:.3f}-auc20={:.3f}".format(
            epoch, val_metrics.get("auc@5", 0.0), val_metrics.get("auc@10", 0.0),
            val_metrics.get("auc@20", 0.0),
        )
        self.index["epoch"] = epoch + 1
        save_checkpoint(os.path.join(self.dir, "last"), state)

        best = [b for b in self.index["best"] if b["name"] != name]
        if len(best) < self.top_k or score > min(b["score"] for b in best):
            save_checkpoint(os.path.join(self.dir, name), state)
            best.append({"name": name, "score": score, "epoch": epoch})
            best.sort(key=lambda b: b["score"], reverse=True)
            for evicted in best[self.top_k:]:
                shutil.rmtree(os.path.join(self.dir, evicted["name"]), ignore_errors=True)
            best = best[: self.top_k]
        else:
            # a re-saved name (resume re-running an epoch) that no longer
            # qualifies must also lose its directory, or index.json and the
            # on-disk set drift apart
            shutil.rmtree(os.path.join(self.dir, name), ignore_errors=True)
        self.index["best"] = best
        self._write_index()

    @property
    def start_epoch(self) -> int:
        return int(self.index.get("epoch", 0))

    @property
    def best_score(self) -> Optional[float]:
        return self.index["best"][0]["score"] if self.index["best"] else None

    def restore_last(self, like: MatcherTrainState) -> MatcherTrainState:
        return load_checkpoint(os.path.join(self.dir, "last"), like=like)


def train_matcher(
    matcher,
    train_datasets: Sequence,
    val_ds,
    cfg: TrainMatcherConfig = TrainMatcherConfig(),
    batch_size: int = 4,
    mesh=None,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    loss_cfg: LossConfig = LossConfig(),
    log_every: int = 10,
    num_workers: int = 2,
):
    """Run the full train/val schedule; returns (state, history).

    history: list of per-epoch dicts {'epoch', 'train_loss', <val metrics>}.
    lr and warmup scale with the TRUE global batch size exactly like
    scripts/train.py:71-77 (world_size is the dp extent of `mesh`; the
    global `batch_size` is what lands on the mesh each step).
    """
    concat = ConcatDataset(list(train_datasets))
    sampler_len = len(concat.datasets) * cfg.n_samples_per_subset
    steps_per_epoch = max(sampler_len // batch_size, 1)

    # scripts/train.py:71-77 — TRUE_LR = canonical_lr * (true_bs / canonical_bs),
    # warmup_step = floor(warmup / scaling)
    scaling = batch_size / cfg.canonical_bs
    true_lr = cfg.canonical_lr * scaling
    warmup = math.floor(cfg.warmup_steps / scaling) if cfg.warmup_steps else 0
    ocfg = OptimConfig(
        lr=true_lr,
        warmup_steps=warmup,
        warmup_ratio=cfg.warmup_ratio,
        scheduler=cfg.scheduler,
        mslr_milestones=tuple(cfg.mslr_milestones),
        mslr_gamma=cfg.mslr_gamma,
        steps_per_epoch=steps_per_epoch,
    )
    import optax

    tx = optax.chain(  # gradient_clip_val=0.5 (scripts/train.py:109)
        optax.clip_by_global_norm(cfg.grad_clip), build_optimizer(ocfg)
    )

    sample = collate_pairs([concat[0]])
    state = init_matcher_train_state(matcher, tx, jax.random.PRNGKey(cfg.seed), sample)

    ckpt = TopKCheckpointer(ckpt_dir, cfg.monitor, cfg.save_top_k) if ckpt_dir else None
    start_epoch = 0
    if resume and ckpt and ckpt.start_epoch > 0:
        state = ckpt.restore_last(state)
        start_epoch = ckpt.start_epoch
        logger.info("resumed from %s at epoch %d", ckpt_dir, start_epoch)

    if mesh is not None:
        from pope_tpu.parallel import shard_batch, shard_params_tp

        state = state._replace(params=shard_params_tp(mesh, state.params))
        step_fn = make_sharded_train_step(matcher, tx, mesh, loss_cfg)
        put = lambda b: shard_batch(mesh, b)
        dp = mesh.shape.get("dp", 1)
        if batch_size % dp:
            raise ValueError(f"batch_size {batch_size} not divisible by dp={dp}")
    else:
        step_fn = jax.jit(
            lambda s, b: matcher_train_step(matcher, tx, s, b, loss_cfg)
        )
        put = lambda b: b

    val_step = make_val_step(matcher, cfg)
    history = []
    for epoch in range(start_epoch, cfg.epochs):
        # fresh per-epoch sampler seed: reproducible given (seed, epoch) AND
        # correct across resume (the reference's single persistent sampler
        # would replay epoch-0 order after every restart)
        sampler = RandomConcatSampler(
            concat, cfg.n_samples_per_subset, seed=cfg.seed + epoch
        )

        def gen_index_batches():
            buf = []
            for i in sampler:
                buf.append(i)
                if len(buf) == batch_size:
                    yield buf
                    buf = []
            # ragged tail dropped (DataLoader drop_last semantics for train)

        def load_batch(idxs):
            # dataset reads + collate run on loader threads (num_workers>1
            # parallelizes IO-bound scene reads; order is preserved)
            return collate_pairs([concat[i] for i in idxs])

        losses = []
        t0 = time.time()
        for k, batch in enumerate(
            ThreadedLoader(gen_index_batches, num_workers=num_workers, fn=load_batch)
        ):
            state, metrics = step_fn(state, put(batch))
            losses.append(metrics["loss"])
            if (k + 1) % log_every == 0:
                logger.info(
                    "epoch %d step %d/%d loss=%.4f (c=%.4f f=%.4f) %.2f s/it",
                    epoch, k + 1, steps_per_epoch, float(metrics["loss"]),
                    float(metrics["loss_coarse"]), float(metrics["loss_fine"]),
                    (time.time() - t0) / (k + 1),
                )
        train_loss = float(np.mean([float(l) for l in losses])) if losses else float("nan")

        val_metrics = validate(
            matcher, state, val_ds, cfg, batch_size,
            val_step=val_step, seed=cfg.seed + epoch, put=put,
        )
        logger.info(
            "epoch %d done: train_loss=%.4f auc@5=%.3f auc@10=%.3f auc@20=%.3f",
            epoch, train_loss, val_metrics["auc@5"], val_metrics["auc@10"],
            val_metrics["auc@20"],
        )
        history.append({"epoch": epoch, "train_loss": train_loss, **val_metrics})
        if ckpt:
            ckpt.save(_host_state(state, mesh), epoch, val_metrics)
    return state, history


def _host_state(state: MatcherTrainState, mesh) -> MatcherTrainState:
    """Gather a mesh-sharded state to host-addressable (replicated) arrays
    before checkpointing (multi-host FSDP states are not directly savable)."""
    if mesh is None:
        return state
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(
        lambda s: s,
        out_shardings=jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), state),
    )(state)


def build_datasets(args):
    """CLI dataset construction: ScanNet/MegaDepth npz-index scenes
    (src/lightning/data.py MultiSceneDataModule file layout)."""
    from pope_tpu.data.scenes import MegaDepthPairDataset, ScanNetPairDataset

    def build(npz_list, mode):
        out = []
        for npz in npz_list:
            if args.data_source == "scannet":
                out.append(ScanNetPairDataset(
                    args.data_root, npz, args.intrinsic_path,
                    min_overlap_score=args.min_overlap_score,
                ))
            else:
                out.append(MegaDepthPairDataset(
                    args.data_root, npz, mode=mode,
                    min_overlap_score=args.min_overlap_score,
                    img_resize=args.img_resize, df=8, img_padding=True,
                    depth_max_size=args.depth_max_size,
                ))
        return out

    train = build(args.train_npz, "train")
    val = build(args.val_npz, "val")
    return train, ConcatDataset(val)


def train_main(args):
    """CLI entry (`pope-tpu train-matcher`)."""
    from pope_tpu.config import MatcherConfig
    from pope_tpu.models.matcher import Matcher

    cfg = TrainMatcherConfig(
        epochs=args.epochs,
        n_samples_per_subset=args.n_samples_per_subset,
        canonical_lr=args.canonical_lr,
        warmup_steps=args.warmup_steps,
        epi_err_thr=args.epi_err_thr,
        seed=args.seed,
    )
    mesh = None
    if args.dp > 1 or args.tp > 1:
        from pope_tpu.parallel import make_mesh

        mesh = make_mesh(args.dp * args.tp, tp=args.tp)
    train_ds, val_ds = build_datasets(args)
    matcher = Matcher(MatcherConfig())
    state, history = train_matcher(
        matcher, train_ds, val_ds, cfg,
        batch_size=args.batch_size,
        mesh=mesh,
        ckpt_dir=args.ckpt_dir,
        resume=args.resume,
    )
    if args.history_out:
        with open(args.history_out, "w") as f:
            json.dump(history, f, indent=1)
    return history
