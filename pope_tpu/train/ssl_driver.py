"""SSL pretraining driver: image-folder dataset -> multi-crop loader ->
jitted DINO+iBOT step, with auto-resume.

Behavioral spec: dinov2/dinov2/train/train.py:133-242 (do_train: data
loader with collate_data_and_cast, cosine schedules applied per step,
periodic checkpointing with latest-checkpoint resume) without the SLURM /
submitit / FSDPCheckpointer machinery (dinov2/run/, dinov2/fsdp/) — the
mesh + orbax equivalents replace those.
"""

from __future__ import annotations

import os
import time
from typing import Iterator, Optional

import jax
import numpy as np

from pope_tpu.data.loader import ThreadedLoader
from pope_tpu.data.ssl_crops import (
    DataAugmentationDINO,
    MaskingGenerator,
    MultiCropConfig,
    collate_multicrop,
)
from pope_tpu.train.ssl import SSLConfig, SSLMetaArch, make_sharded_ssl_step
from pope_tpu.config import DinoV2Config
from pope_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from pope_tpu.utils.logging import get_logger

logger = get_logger("pope_tpu.ssl")

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def iter_image_files(root: str):
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(IMG_EXTS):
                yield os.path.join(dirpath, f)


def make_ssl_batches(image_root: str, cfg: SSLConfig, batch_size: int,
                     seed: int = 0, num_workers: int = 4,
                     rank: int = 0, world: int = 1,
                     advance_batches: int = 0) -> Iterator[dict]:
    """Endless stream of collated multi-crop batches (host numpy),
    RESUMABLE mid-epoch.

    Sharding + resume come from data.samplers.ShardedInfiniteSampler
    (spec: dinov2/dinov2/data/samplers.py:166-230): every rank draws a
    disjoint strided shard of one shared epoch permutation, reshuffled per
    iteration, and ``advance_batches`` fast-forwards this rank's stream by
    k already-consumed batches — whole epochs skipped O(1).

    Every random decision (shuffle order, crop/jitter/blur parameters,
    iBOT masks, collate sampling) is a pure function of
    (seed, rank, stream position), NOT of stateful RNG objects, so a
    killed-and-resumed run reproduces the unkilled batch stream exactly
    (tests/test_samplers.py::test_ssl_batches_resume_mid_epoch). The
    reference gets the same property from sampler advance + per-worker
    seeding (dinov2/data/loaders.py:70-85)."""
    import cv2

    from pope_tpu.data.samplers import ShardedInfiniteSampler

    # sorted: os.walk's directory order is filesystem-dependent; the
    # sampler's indices must refer to a stable file list across restarts
    files = sorted(iter_image_files(image_root))
    if not files:
        raise FileNotFoundError(f"no images under {image_root}")
    crop_cfg = MultiCropConfig(
        global_crop_size=cfg.global_crop_size,
        local_crop_size=cfg.local_crop_size,
        n_local_crops=cfg.n_local_crops,
    )
    n_tokens_side = cfg.global_crop_size // 14

    def forever():
        sampler = ShardedInfiniteSampler(
            len(files), shuffle=True, seed=seed, start=rank, step=world,
            advance=advance_batches * batch_size,
        )
        aug = DataAugmentationDINO(crop_cfg, seed=0)
        gen = MaskingGenerator(input_size=n_tokens_side, seed=0)
        pos = advance_batches * batch_size  # per-rank stream position
        b = advance_batches  # per-rank batch counter
        batch = []
        for idx in sampler:
            img = cv2.imread(files[idx], cv2.IMREAD_COLOR)
            pos += 1  # advances on FAILED reads too: position stays pure
            if img is None:
                continue
            # per-sample augmentation stream keyed by absolute position
            aug.rng = np.random.default_rng(
                np.random.SeedSequence([seed, rank, pos, 3])
            )
            batch.append(aug(img[..., ::-1]))  # BGR -> RGB
            if len(batch) == batch_size:
                gen.rng = np.random.default_rng(
                    np.random.SeedSequence([seed, rank, b, 7])
                )
                yield collate_multicrop(
                    batch, gen,
                    mask_ratio=(cfg.mask_ratio_min, cfg.mask_ratio_max),
                    mask_probability=cfg.mask_sample_probability,
                    seed=int(
                        np.random.default_rng(
                            np.random.SeedSequence([seed, rank, b, 13])
                        ).integers(1 << 31)
                    ),
                )
                b += 1
                batch = []

    return iter(ThreadedLoader(forever, num_workers=num_workers))


def train_ssl(image_root: str,
              cfg: SSLConfig = SSLConfig(),
              backbone_cfg: DinoV2Config = DinoV2Config(),
              batch_size: int = 8,
              total_steps: Optional[int] = None,
              ckpt_dir: Optional[str] = None,
              ckpt_every: int = 1000,
              log_every: int = 10,
              mesh=None,
              seed: int = 0):
    """Run SSL pretraining; returns the final SSLState."""
    arch = SSLMetaArch(cfg, backbone_cfg)
    state = arch.init_state(jax.random.PRNGKey(seed))
    if ckpt_dir:
        path = latest_checkpoint(ckpt_dir)
        if path:
            logger.info("resuming from %s", path)
            state = load_checkpoint(path, like=state)
    mults = arch.multipliers(state)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pope_tpu.train.ssl import shard_ssl_state

        state = shard_ssl_state(state, mesh)
        step_fn = make_sharded_ssl_step(arch, mesh, mults=mults)

        if jax.process_count() > 1:
            # multi-host: every host holds 1/process_count of the batch; the
            # global dp-sharded array is assembled without any cross-host
            # data movement (each shard already lives on its host's devices)
            def put(batch):
                return {
                    k: jax.make_array_from_process_local_data(
                        NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1)))), v
                    )
                    for k, v in batch.items()
                }
        else:
            def put(batch):
                return {
                    k: jax.device_put(
                        v, NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1))))
                    )
                    for k, v in batch.items()
                }
    else:
        step_fn = jax.jit(lambda s, b: arch.train_step(s, b, mults=mults))
        put = lambda batch: batch

    total = total_steps if total_steps is not None else cfg.total_iters
    nproc = jax.process_count()
    if batch_size % max(nproc, 1):
        raise ValueError(
            f"batch_size {batch_size} must be divisible by process count {nproc}"
        )
    # Data-stream resume (dinov2 samplers.py advance semantics): each rank
    # has consumed exactly state.step per-host batches, so the sampler
    # fast-forwards by that many — a killed-and-resumed run continues the
    # SAME shuffled stream mid-epoch instead of restarting the epoch. The
    # sidecar written at checkpoint time validates the stream is actually
    # resumable (same seed / world / per-host batch).
    start = int(jax.device_get(state.step))
    per_host_batch = batch_size // max(nproc, 1)
    if ckpt_dir and start:
        meta_path = os.path.join(ckpt_dir, "sampler.json")
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                meta = json.load(f)
            mismatch = {
                k: (meta.get(k), v)
                for k, v in (("seed", seed), ("world", nproc),
                             ("per_host_batch", per_host_batch))
                if meta.get(k) != v
            }
            if mismatch:
                logger.warning(
                    "sampler stream NOT resumable (%s changed: %s); the data "
                    "order restarts from the advance point under the new "
                    "topology", ",".join(mismatch), mismatch,
                )
    batches = make_ssl_batches(
        image_root, cfg, per_host_batch, seed=seed,
        rank=jax.process_index(), world=nproc,
        advance_batches=start,
    )
    def save(name, st):
        # multi-host: the FSDP-sharded state is not host-addressable — first
        # replicate it (an all-gather every host participates in), then only
        # process 0 touches the filesystem
        if nproc > 1 and mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            st = jax.jit(
                lambda s: s,
                out_shardings=jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P()), st
                ),
            )(st)
            if jax.process_index() != 0:
                return
        save_checkpoint(os.path.join(ckpt_dir, name), st)
        # sampler-state sidecar: everything needed to resume the data
        # stream exactly (the consumed-batch count itself is state.step)
        import json

        with open(os.path.join(ckpt_dir, "sampler.json"), "w") as f:
            json.dump(
                {"seed": seed, "world": nproc, "per_host_batch": per_host_batch,
                 "consumed_batches": int(jax.device_get(st.step))}, f,
            )

    t0 = time.time()
    for i in range(start, total):
        state, metrics = step_fn(state, put(next(batches)))
        if (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(
                "step %d/%d loss=%.4f dino_g=%.4f dino_l=%.4f ibot=%.4f "
                "koleo=%.4f lr=%.2e (%.2f s/it)",
                i + 1, total, m["total_loss"], m["dino_global_crops_loss"],
                m.get("dino_local_crops_loss", 0.0), m.get("ibot_loss", 0.0),
                m.get("koleo_loss", 0.0), m["lr"], (time.time() - t0) / max(i + 1 - start, 1),
            )
        if ckpt_dir and (i + 1) % ckpt_every == 0:
            save(f"step_{i + 1:08d}", state)
    if ckpt_dir:
        save(f"step_{total:08d}", state)
    return state


def train_main(args):
    """CLI entry (`pope-tpu train-ssl`)."""
    arch_sizes = {
        "vit_small": dict(embed_dim=384, depth=12, num_heads=6),
        "vit_base": dict(embed_dim=768, depth=12, num_heads=12),
        "vit_large": dict(embed_dim=1024, depth=24, num_heads=16),
        # vit_giant2: SwiGLU-fused FFN (vision_transformer.py:345-361)
        "vit_giant": dict(
            embed_dim=1536, depth=40, num_heads=24, ffn_layer="swiglufused"
        ),
    }
    bcfg = DinoV2Config(
        patch_size=14,
        drop_path_rate=getattr(args, "drop_path_rate", 0.0),
        **arch_sizes[args.arch],
    )
    cfg = SSLConfig(
        global_crop_size=args.global_crop_size,
        local_crop_size=args.local_crop_size,
        n_local_crops=args.n_local_crops,
        total_iters=args.total_steps,
        warmup_iters=max(args.total_steps // 10, 1),
        warmup_teacher_temp_iters=max(args.total_steps // 4, 1),
        freeze_last_layer_iters=max(args.total_steps // 100, 1),
        lr=args.lr,
    )
    mesh = None
    if args.dp > 1:
        from pope_tpu.parallel import make_mesh

        mesh = make_mesh(args.dp, tp=1)
    train_ssl(
        args.image_root, cfg, bcfg,
        batch_size=args.batch_size,
        total_steps=args.total_steps,
        ckpt_dir=args.ckpt_dir,
        ckpt_every=args.ckpt_every,
        mesh=mesh,
        seed=args.seed,
    )
