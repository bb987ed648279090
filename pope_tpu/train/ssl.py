"""DINOv2 self-supervised pretraining (DINO + iBOT + KoLeo), TPU-native.

Behavioral spec — the reference's vendored dinov2 training stack:
  - meta-architecture: dinov2/dinov2/train/ssl_meta_arch.py:34-349
    (student/teacher backbone+heads, 2 global + n local crops, reversed
    teacher pairing for the global DINO terms, masked iBOT patch loss,
    KoLeo on student global cls tokens, EMA teacher update :359-368)
  - DINO head: dinov2/dinov2/layers/dino_head.py (MLP -> L2-normalize ->
    weight-normed last linear with g initialised to 1)
  - losses: dinov2/dinov2/loss/dino_clstoken_loss.py (softmax-centered CE,
    EMA center update, sinkhorn-knopp option),
    dinov2/dinov2/loss/ibot_patch_loss.py (masked patch CE with per-sample
    1/n_masked weights), dinov2/dinov2/loss/koleo_loss.py
  - schedules + optimizer grouping: dinov2/dinov2/train/train.py:66-130
    (cosine lr/wd/momentum/teacher-temp, frozen last-layer lr),
    dinov2/dinov2/utils/param_groups.py (layerwise lr decay,
    patch_embed lr mult, no wd on 1-d params)

TPU-first redesign (not a port):
  - Everything is functional state: centers, EMA teacher, Adam moments live
    in an `SSLState` pytree; one `ssl_train_step` jits the whole
    teacher-forward / student-forward / losses / AdamW / EMA update.
  - The reference gathers masked patch tokens with dynamic-length
    `index_select` into an `upperbound` buffer (ssl_meta_arch.py:173-196) —
    a dynamic shape per step. Here the iBOT head runs DENSE over all global
    patch tokens and the loss is mask-weighted: identical math (the
    reference's masks_weight = 1/n_masked(b) per masked token,
    collate.py:40), static shapes, no gathers — XLA keeps the 65k-prototype
    matmul on the MXU.
  - FSDP/DDP (fsdp/__init__.py:23-120, distributed/__init__.py) maps to a
    `jax.sharding` mesh: batch axes shard on `dp`; with sharded inputs the
    center updates / loss means become global automatically (the SPMD
    partitioner inserts the psums the reference issues by hand with
    `dist.all_reduce`). Param FSDP = NamedSharding on the leading axis via
    `shard_ssl_state`.
  - The fp16 ShardedGradScaler is unnecessary: compute runs bf16 (MXU
    native) with f32 params/moments, which needs no loss scaling.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pope_tpu.config import DinoV2Config
from pope_tpu.models.dinov2 import DinoVisionTransformer


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SSLConfig:
    # crops (ssl_default_config.yaml `crops`)
    global_crop_size: int = 224
    local_crop_size: int = 98
    n_local_crops: int = 8
    # dino (cfg.dino)
    dino_out_dim: int = 65536  # head_n_prototypes
    head_hidden_dim: int = 2048
    head_bottleneck_dim: int = 256
    head_nlayers: int = 3
    dino_loss_weight: float = 1.0
    koleo_loss_weight: float = 0.1
    # ibot (cfg.ibot)
    head_dtype: str = "bfloat16"  # cfg.compute_precision equivalent
    ibot_loss_weight: float = 1.0
    ibot_separate_head: bool = False
    ibot_out_dim: int = 65536
    mask_ratio_min: float = 0.1
    mask_ratio_max: float = 0.5
    mask_sample_probability: float = 0.5
    # temps / centering (cfg.teacher, cfg.train.centering)
    student_temp: float = 0.1
    warmup_teacher_temp: float = 0.04
    teacher_temp: float = 0.07
    warmup_teacher_temp_iters: int = 37500
    center_momentum: float = 0.9
    centering: str = "centering"  # | 'sinkhorn_knopp'
    sinkhorn_iterations: int = 3
    # optim (cfg.optim)
    lr: float = 4e-3
    min_lr: float = 1e-6
    warmup_iters: int = 12500
    total_iters: int = 125000
    weight_decay: float = 0.04
    weight_decay_end: float = 0.4
    adamw_beta1: float = 0.9
    adamw_beta2: float = 0.999
    layerwise_decay: float = 0.9
    patch_embed_lr_mult: float = 0.2
    freeze_last_layer_iters: int = 1250
    # teacher EMA (cfg.teacher.momentum_teacher)
    momentum_teacher: float = 0.992
    final_momentum_teacher: float = 1.0


# ---------------------------------------------------------------------------
# DINO head
# ---------------------------------------------------------------------------


class DINOHead(nn.Module):
    """MLP -> L2-normalize -> weight-normed prototypes (dino_head.py:13-43).

    The torch weight_norm last layer keeps a direction `v` and per-row gain
    `g` (initialised to 1); here they are explicit params `last_v`/`last_g`
    so the EMA teacher update and checkpoint conversion see the same
    factorisation the reference trains.
    """

    in_dim: int
    out_dim: int
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.truncated_normal(0.02)
        n = max(self.nlayers, 1)
        if n == 1:
            x = nn.Dense(self.bottleneck_dim, kernel_init=init, dtype=self.dtype, name="mlp_0")(x)
        else:
            x = nn.Dense(self.hidden_dim, kernel_init=init, dtype=self.dtype, name="mlp_0")(x)
            x = nn.gelu(x, approximate=False)
            for i in range(n - 2):
                x = nn.Dense(self.hidden_dim, kernel_init=init, dtype=self.dtype, name=f"mlp_{i + 1}")(x)
                x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.bottleneck_dim, kernel_init=init, dtype=self.dtype, name=f"mlp_{n - 1}")(x)
        x = x.astype(jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        v = self.param("last_v", init, (self.bottleneck_dim, self.out_dim))
        g = self.param("last_g", nn.initializers.ones, (self.out_dim,))
        w = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12) * g[None, :]
        return x @ w


# ---------------------------------------------------------------------------
# losses (functional; centers are explicit state)
# ---------------------------------------------------------------------------


def softmax_center_teacher(logits, center, teacher_temp):
    """dino_clstoken_loss.py:30-33 / ibot_patch_loss.py:47-57."""
    return jax.nn.softmax((logits - center) / teacher_temp, axis=-1)


def update_center(center, teacher_logits, momentum: float = 0.9):
    """EMA center over the (globally sharded) teacher batch
    (dino_clstoken_loss.py:79-101): under pjit with a dp-sharded batch the
    mean is the cross-chip mean automatically."""
    batch_center = jnp.mean(teacher_logits, axis=tuple(range(teacher_logits.ndim - 1)))
    return center * momentum + batch_center * (1.0 - momentum)


def sinkhorn_knopp_teacher(logits, teacher_temp, n_iterations: int = 3,
                           sample_weight=None):
    """Batch-prototype balanced assignment (dino_clstoken_loss.py:35-62).
    `sample_weight` (rows) marks real samples (1) vs padding (0) so the iBOT
    variant can weight by true masked-patch count (ibot_patch_loss.py:59-87)
    without dynamic shapes."""
    Q = jnp.exp(logits.astype(jnp.float32) / teacher_temp).T  # (K, B)
    K, B = Q.shape
    if sample_weight is not None:
        Q = Q * sample_weight[None, :]
        n_samples = jnp.sum(sample_weight)
    else:
        n_samples = jnp.asarray(B, jnp.float32)
    # Zero-weight columns (padding / unmasked samples in the dense iBOT
    # path) give 0/0 in the column normalization and the NaN poisons all of
    # Q. Guard EXACT zeros only (divide the zero row/column by 1 so it
    # stays zero): genuinely tiny-but-nonzero sums must still divide
    # through, or f32-underflowed prototype rows lose parity with the
    # reference sinkhorn.
    def _safe(x):
        return jnp.where(x == 0.0, 1.0, x)

    Q = Q / _safe(jnp.sum(Q))
    for _ in range(n_iterations):
        Q = Q / _safe(jnp.sum(Q, axis=1, keepdims=True) * K)
        Q = Q / _safe(jnp.sum(Q, axis=0, keepdims=True) * n_samples)
    return (Q * n_samples).T


def dino_cross_entropy(student_logits, teacher_probs, student_temp: float = 0.1):
    """-sum(t * log_softmax(s/temp)) meaned over the batch
    (dino_clstoken_loss.py:64-75)."""
    lsm = jax.nn.log_softmax(student_logits.astype(jnp.float32) / student_temp, axis=-1)
    return -jnp.mean(jnp.sum(teacher_probs * lsm, axis=-1))


def ibot_patch_loss_dense(student_patch_logits, teacher_patch_probs, masks,
                          student_temp: float = 0.1):
    """Masked patch CE, dense: every (b, patch) term is weighted
    mask / n_masked(b) and the sum is divided by B — exactly
    `forward_masked` with collate.py:40's masks_weight, without the
    dynamic-length gather. masks: (B, N) bool."""
    lsm = jax.nn.log_softmax(
        student_patch_logits.astype(jnp.float32) / student_temp, axis=-1
    )
    per_tok = jnp.sum(teacher_patch_probs * lsm, axis=-1)  # (B, N)
    w = masks.astype(jnp.float32)
    w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    return -jnp.sum(per_tok * w) / masks.shape[0]


def koleo_loss(x, eps: float = 1e-8):
    """Kozachenko-Leonenko entropy regularizer (koleo_loss.py:19-49):
    -mean log distance to the nearest neighbour of each L2-normalized
    cls token."""
    x = x.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    dots = x @ x.T
    n = x.shape[0]
    dots = jnp.where(jnp.eye(n, dtype=bool), -1.0, dots)
    nn_idx = jnp.argmax(dots, axis=1)
    d = jnp.linalg.norm(x - x[nn_idx], axis=-1)
    return -jnp.mean(jnp.log(d + eps))


# ---------------------------------------------------------------------------
# schedules (train.py:66-115 CosineScheduler semantics, traced-step safe)
# ---------------------------------------------------------------------------


def cosine_schedule(step, base, final, total, warmup: int = 0, start: float = 0.0):
    step = jnp.asarray(step, jnp.float32)
    warm = start + (base - start) * step / jnp.maximum(warmup, 1)
    t = jnp.clip((step - warmup) / jnp.maximum(total - warmup, 1), 0.0, 1.0)
    cos = final + 0.5 * (base - final) * (1.0 + jnp.cos(jnp.pi * t))
    return jnp.where(step < warmup, warm, cos)


def ssl_schedules(cfg: SSLConfig, step):
    """lr / wd / teacher momentum / teacher temp / last-layer lr at `step`."""
    lr = cosine_schedule(step, cfg.lr, cfg.min_lr, cfg.total_iters, cfg.warmup_iters)
    wd = cosine_schedule(step, cfg.weight_decay, cfg.weight_decay_end, cfg.total_iters)
    mom = cosine_schedule(step, cfg.momentum_teacher, cfg.final_momentum_teacher, cfg.total_iters)
    temp = jnp.where(
        jnp.asarray(step, jnp.float32) < cfg.warmup_teacher_temp_iters,
        cfg.warmup_teacher_temp
        + (cfg.teacher_temp - cfg.warmup_teacher_temp)
        * jnp.asarray(step, jnp.float32) / max(cfg.warmup_teacher_temp_iters, 1),
        cfg.teacher_temp,
    )
    last_lr = jnp.where(jnp.asarray(step) < cfg.freeze_last_layer_iters, 0.0, lr)
    return {"lr": lr, "wd": wd, "momentum": mom, "teacher_temp": temp, "last_layer_lr": last_lr}


# ---------------------------------------------------------------------------
# param grouping (param_groups.py semantics as static multiplier trees)
# ---------------------------------------------------------------------------


def _block_index(path: Tuple[str, ...], depth: int) -> int:
    """get_params_groups_with_decay layer ids: patch_embed/cls/pos/mask = 0,
    block i = i+1, everything else (final norm, heads) = depth+1."""
    for p in path:
        if p.startswith("block_"):
            return int(p.split("_")[1]) + 1
    joined = "/".join(path)
    if any(k in joined for k in ("patch_embed", "cls_token", "pos_embed", "mask_token")):
        return 0
    return depth + 1


def build_group_multipliers(params, cfg: SSLConfig, depth: int):
    """Per-leaf {lr_mult, wd_mult, is_last_layer} trees (static)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_strs(kp):
        return tuple(
            k.key if hasattr(k, "key") else str(k) for k in kp
        )

    lr_mults, wd_mults, last_flags = {}, {}, {}
    for kp, leaf in flat:
        path = path_strs(kp)
        key = "/".join(path)
        in_backbone = path[0] == "backbone"
        layer_id = _block_index(path, depth) if in_backbone else depth + 1
        lr_m = cfg.layerwise_decay ** (depth + 1 - layer_id) if in_backbone else 1.0
        if "patch_embed" in key:
            lr_m *= cfg.patch_embed_lr_mult
        # no weight decay on 1-d params (norms, biases, gains, tokens)
        wd_m = 0.0 if (leaf.ndim <= 1 or "token" in key or "pos_embed" in key) else 1.0
        last = 1.0 if "last_v" in key or "last_g" in key else 0.0
        lr_mults[key] = lr_m
        wd_mults[key] = wd_m
        last_flags[key] = last

    def to_tree(d):
        return jax.tree_util.tree_map_with_path(
            lambda kp, _: jnp.asarray(d["/".join(path_strs(kp))], jnp.float32), params
        )

    return to_tree(lr_mults), to_tree(wd_mults), to_tree(last_flags)


# ---------------------------------------------------------------------------
# meta-arch
# ---------------------------------------------------------------------------


class SSLState(NamedTuple):
    step: jnp.ndarray
    student: Any  # {'backbone': .., 'dino_head': .., ['ibot_head': ..]}
    teacher: Any  # same structure, no grads
    mu: Any  # Adam first moments (student structure)
    nu: Any  # Adam second moments
    dino_center: jnp.ndarray  # (K,)
    ibot_center: jnp.ndarray  # (K,)


class SSLMetaArch:
    """Owns the modules + static multiplier trees; all methods are pure."""

    def __init__(self, cfg: SSLConfig = SSLConfig(),
                 backbone_cfg: DinoV2Config = DinoV2Config()):
        self.cfg = cfg
        self.backbone_cfg = backbone_cfg
        self.backbone = DinoVisionTransformer(backbone_cfg)
        head = lambda out: DINOHead(
            in_dim=backbone_cfg.embed_dim, out_dim=out,
            hidden_dim=cfg.head_hidden_dim, bottleneck_dim=cfg.head_bottleneck_dim,
            nlayers=cfg.head_nlayers, dtype=jnp.dtype(cfg.head_dtype),
        )
        self.dino_head = head(cfg.dino_out_dim)
        self.ibot_head = head(cfg.ibot_out_dim) if cfg.ibot_separate_head else None

    # -- init ---------------------------------------------------------------

    def init_state(self, rng) -> SSLState:
        cfg, bcfg = self.cfg, self.backbone_cfg
        r1, r2, r3 = jax.random.split(rng, 3)
        g = cfg.global_crop_size
        student = {
            "backbone": self.backbone.init(r1, jnp.zeros((1, g, g, 3)))["params"],
            "dino_head": self.dino_head.init(r2, jnp.zeros((1, bcfg.embed_dim)))["params"],
        }
        if self.ibot_head is not None:
            student["ibot_head"] = self.ibot_head.init(
                r3, jnp.zeros((1, bcfg.embed_dim))
            )["params"]
        teacher = jax.tree_util.tree_map(jnp.copy, student)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, student)
        return SSLState(
            step=jnp.zeros((), jnp.int32),
            student=student,
            teacher=teacher,
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, student),
            dino_center=jnp.zeros((cfg.dino_out_dim,)),
            ibot_center=jnp.zeros((cfg.ibot_out_dim if cfg.ibot_separate_head
                                   else cfg.dino_out_dim,)),
        )

    def multipliers(self, state: SSLState):
        return build_group_multipliers(state.student, self.cfg, self.backbone_cfg.depth)

    # -- forward pieces -----------------------------------------------------

    def _teacher_targets(self, teacher, global_crops, masks, centers, temp):
        """Teacher global forward -> (dino probs with REVERSED crop pairing,
        ibot patch probs, new centers). ssl_meta_arch.py:160-232."""
        cfg = self.cfg
        out = self.backbone.apply({"params": teacher["backbone"]}, global_crops)
        cls = out["x_norm_clstoken"]  # (2B, C)
        patches = out["x_norm_patchtokens"]  # (2B, N, C)
        B = cls.shape[0] // 2
        # crop A's target comes from crop B and vice versa (:166-167)
        cls_rev = jnp.concatenate([cls[B:], cls[:B]], axis=0)
        dino_logits = self.dino_head.apply({"params": teacher["dino_head"]}, cls_rev)
        head_p, head_name = (
            (teacher["ibot_head"], self.ibot_head)
            if self.ibot_head is not None
            else (teacher["dino_head"], self.dino_head)
        )
        ibot_logits = head_name.apply({"params": head_p}, patches)
        dino_center, ibot_center = centers
        if cfg.centering == "sinkhorn_knopp":
            dino_probs = sinkhorn_knopp_teacher(dino_logits, temp, cfg.sinkhorn_iterations)
            flat = ibot_logits.reshape(-1, ibot_logits.shape[-1])
            w = masks.reshape(-1).astype(jnp.float32)
            ibot_probs = sinkhorn_knopp_teacher(
                flat, temp, cfg.sinkhorn_iterations, sample_weight=w
            ).reshape(ibot_logits.shape)
            new_centers = (dino_center, ibot_center)
        else:
            dino_probs = softmax_center_teacher(dino_logits, dino_center, temp)
            ibot_probs = softmax_center_teacher(ibot_logits, ibot_center, temp)
            # iBOT center over masked tokens only (ibot_patch_loss.py:129-137
            # uses the mean over patch tokens; we match the masked-token mean
            # the sinkhorn path and the update_center buffer see)
            w = masks.astype(jnp.float32)[..., None]
            masked_mean = jnp.sum(ibot_logits * w, axis=(0, 1)) / jnp.clip(
                jnp.sum(w), 1.0
            )
            new_centers = (
                dino_center * cfg.center_momentum
                + jnp.mean(dino_logits, axis=0) * (1 - cfg.center_momentum),
                ibot_center * cfg.center_momentum
                + masked_mean * (1 - cfg.center_momentum),
            )
        return dino_probs, ibot_probs, new_centers

    def _student_losses(self, student, batch, dino_probs, ibot_probs, masks,
                        rng=None):
        cfg = self.cfg
        n_local = cfg.n_local_crops
        n_global_terms = 2  # (2-1)*2
        n_local_terms = max(n_local * 2, 1)

        # stochastic depth (ssl_default_config.yaml:74 drop_path_rate) is a
        # student-only training regularizer; the teacher forward stays clean
        use_dp = self.backbone_cfg.drop_path_rate > 0 and rng is not None
        def dp_kw(i):
            if not use_dp:
                return {}
            return dict(train=True, rngs={"drop_path": jax.random.fold_in(rng, i)})

        g_out = self.backbone.apply(
            {"params": student["backbone"]}, batch["global_crops"], masks=masks,
            **dp_kw(0),
        )
        losses = {}
        total = 0.0

        if n_local > 0:
            l_out = self.backbone.apply(
                {"params": student["backbone"]}, batch["local_crops"], **dp_kw(1)
            )
            local_logits = self.dino_head.apply(
                {"params": student["dino_head"]}, l_out["x_norm_clstoken"]
            )  # (n_local*B, K)
            B = dino_probs.shape[0] // 2
            # each local chunk is scored against BOTH teacher global chunks
            # (dino loss list-x-list, ssl_meta_arch.py:281-285). Computed in
            # the FLAT layout: sum_i CE(chunk_i, t_j) == n_local *
            # CE(local_logits, tile(t_j)) since crops stack crop-major —
            # reshaping the student logits to (n_local, B, K) put a
            # dp-sharding on the size-n_local axis and forced the SPMD
            # partitioner into involuntary full rematerialization in the
            # backward (MULTICHIP_r02); only the (gradient-free) teacher
            # tensor is chunked now.
            t_chunks = dino_probs.reshape(2, B, -1)
            local_loss = 0.0
            for j in range(2):
                t_rep = jnp.concatenate([t_chunks[j]] * n_local, axis=0)
                local_loss += n_local * dino_cross_entropy(
                    local_logits, t_rep, cfg.student_temp
                )
            local_loss = local_loss / (n_global_terms + n_local_terms)
            losses["dino_local_crops_loss"] = local_loss
            total += cfg.dino_loss_weight * local_loss

        g_cls = g_out["x_norm_clstoken"]  # (2B, C)
        g_logits = self.dino_head.apply({"params": student["dino_head"]}, g_cls)
        # teacher probs are already reversed, so direct alignment is the
        # cross-crop term; x2 for processing both global crops together
        global_loss = (
            dino_cross_entropy(g_logits, dino_probs, cfg.student_temp)
            * 2.0 / (n_global_terms + n_local_terms)
        )
        losses["dino_global_crops_loss"] = global_loss
        total += cfg.dino_loss_weight * global_loss

        if cfg.koleo_loss_weight > 0:
            B = g_cls.shape[0] // 2
            kl = cfg.koleo_loss_weight * (
                koleo_loss(g_cls[:B]) + koleo_loss(g_cls[B:])
            )  # per-crop, never across crops of one image (:316-319)
            losses["koleo_loss"] = kl / 2.0
            total += kl

        if cfg.ibot_loss_weight > 0:
            head_p, head = (
                (student["ibot_head"], self.ibot_head)
                if self.ibot_head is not None
                else (student["dino_head"], self.dino_head)
            )
            patch_logits = head.apply({"params": head_p}, g_out["x_norm_patchtokens"])
            ibot = ibot_patch_loss_dense(patch_logits, ibot_probs, masks,
                                         cfg.student_temp)
            # * 2 (loss_scales) * 1/2 (ibot_loss_scale = 1/n_global_crops)
            losses["ibot_loss"] = ibot / 2.0
            total += cfg.ibot_loss_weight * ibot
        return total, losses

    # -- the step -----------------------------------------------------------

    def train_step(self, state: SSLState, batch: Dict[str, jnp.ndarray],
                   mults=None) -> Tuple[SSLState, Dict[str, jnp.ndarray]]:
        """One fully-jittable SSL step.

        batch: global_crops (2B, S, S, 3) [crop0 batch then crop1 batch,
        collate.py ordering], local_crops (n_local*B, s, s, 3),
        masks (2B, N) bool.
        """
        cfg = self.cfg
        sched = ssl_schedules(cfg, state.step)
        masks = batch["masks"]

        dino_probs, ibot_probs, new_centers = self._teacher_targets(
            state.teacher, batch["global_crops"], masks,
            (state.dino_center, state.ibot_center), sched["teacher_temp"],
        )
        dino_probs = jax.lax.stop_gradient(dino_probs)
        ibot_probs = jax.lax.stop_gradient(ibot_probs)

        # deterministic per-step noise stream (resume-safe: derived from the
        # step counter, not host state)
        dp_rng = jax.random.fold_in(jax.random.PRNGKey(1717), state.step)

        def loss_fn(student):
            return self._student_losses(
                student, batch, dino_probs, ibot_probs, masks, rng=dp_rng
            )

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.student)

        if mults is None:
            mults = build_group_multipliers(state.student, cfg, self.backbone_cfg.depth)
        lr_m, wd_m, last_f = mults

        # AdamW with per-leaf lr/wd multipliers + frozen-last-layer schedule
        b1, b2, eps = cfg.adamw_beta1, cfg.adamw_beta2, 1e-8
        t = state.step.astype(jnp.float32) + 1.0
        bc1 = 1.0 - b1**t
        bc2 = 1.0 - b2**t

        def upd(p, g, mu, nu, lm, wm, lf):
            g = g.astype(jnp.float32)
            mu2 = b1 * mu + (1 - b1) * g
            nu2 = b2 * nu + (1 - b2) * g * g
            step_lr = (sched["last_layer_lr"] * lf + sched["lr"] * (1 - lf)) * lm
            adam = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
            p2 = p - step_lr * (adam + sched["wd"] * wm * p)
            return p2, mu2, nu2

        flat = jax.tree_util.tree_map(upd, state.student, grads, state.mu, state.nu,
                                      lr_m, wd_m, last_f)
        new_student = jax.tree_util.tree_map(lambda x: x[0], flat,
                                             is_leaf=lambda x: isinstance(x, tuple))
        new_mu = jax.tree_util.tree_map(lambda x: x[1], flat,
                                        is_leaf=lambda x: isinstance(x, tuple))
        new_nu = jax.tree_util.tree_map(lambda x: x[2], flat,
                                        is_leaf=lambda x: isinstance(x, tuple))

        # EMA teacher (ssl_meta_arch.py:359-368)
        m = sched["momentum"]
        new_teacher = jax.tree_util.tree_map(
            lambda tp, sp: tp * m + sp * (1.0 - m), state.teacher, new_student
        )

        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["lr"] = sched["lr"]
        metrics["teacher_momentum"] = m
        return (
            SSLState(
                step=state.step + 1,
                student=new_student,
                teacher=new_teacher,
                mu=new_mu,
                nu=new_nu,
                dino_center=new_centers[0],
                ibot_center=new_centers[1],
            ),
            metrics,
        )


def make_sharded_ssl_step(arch: SSLMetaArch, mesh, mults=None):
    """jit the SSL step over a mesh: batch leading axes shard on `dp`
    (crops/masks), params replicate (or FSDP-shard via shard_ssl_state).
    Replaces the reference's FSDP wrapper + NCCL process group
    (fsdp/__init__.py:23, distributed/__init__.py:152-263): the SPMD
    partitioner inserts the gradient/center psums."""

    def step(state, batch):
        return arch.train_step(state, batch, mults=mults)

    with mesh:
        return jax.jit(step)


def shard_ssl_state(state: SSLState, mesh, min_size: int = 2**15) -> SSLState:
    """FSDP-style param/moment sharding: leading axis of every >=2-d leaf
    whose dim divides the dp axis shards across `dp`; everything else
    replicates (the fsdp ShardingStrategy equivalent).

    min_size: leaves below this element count replicate. Matches FSDP's
    min_num_params practice, and empirically the GSPMD partitioner falls
    into 'involuntary full rematerialization' in the ViT attention backward
    when micro-kernels are dp-sharded (MULTICHIP_r02 tail; XLA b/433785288)
    — sharding them buys nothing and costs gather traffic anyway."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = mesh.shape["dp"]

    def spec_of(x):
        if x.ndim >= 2 and x.shape[0] % ndev == 0 and x.size >= min_size:
            return NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    def place(x):
        return jax.device_put(x, spec_of(x))

    return SSLState(
        step=jax.device_put(state.step, NamedSharding(mesh, jax.sharding.PartitionSpec())),
        student=jax.tree_util.tree_map(place, state.student),
        teacher=jax.tree_util.tree_map(place, state.teacher),
        mu=jax.tree_util.tree_map(place, state.mu),
        nu=jax.tree_util.tree_map(place, state.nu),
        dino_center=jax.device_put(state.dino_center, NamedSharding(mesh, jax.sharding.PartitionSpec())),
        ibot_center=jax.device_put(state.ibot_center, NamedSharding(mesh, jax.sharding.PartitionSpec())),
    )
