"""DINOv2 SSL pretraining stack: loss parity vs the reference torch
implementations (oracle at test time), masking/collate semantics, and the
end-to-end jitted train step (single- and 8-device mesh)."""

import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from pope_tpu.config import DinoV2Config
from pope_tpu.data.ssl_crops import (
    DataAugmentationDINO,
    MaskingGenerator,
    MultiCropConfig,
    collate_multicrop,
)
from pope_tpu.train.ssl import (
    DINOHead,
    SSLConfig,
    SSLMetaArch,
    build_group_multipliers,
    dino_cross_entropy,
    ibot_patch_loss_dense,
    koleo_loss,
    make_sharded_ssl_step,
    shard_ssl_state,
    sinkhorn_knopp_teacher,
    softmax_center_teacher,
    ssl_schedules,
    update_center,
)


def _ref_losses():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from dinov2.dinov2.loss.dino_clstoken_loss import DINOLoss
    from dinov2.dinov2.loss.ibot_patch_loss import iBOTPatchLoss
    from dinov2.dinov2.loss.koleo_loss import KoLeoLoss

    return DINOLoss, iBOTPatchLoss, KoLeoLoss


def test_dino_softmax_center_and_ce_parity(rng):
    DINOLoss, _, _ = _ref_losses()
    K, B = 32, 6
    t_logits = rng.standard_normal((B, K)).astype(np.float32)
    s_logits = rng.standard_normal((B, K)).astype(np.float32)
    center = rng.standard_normal((K,)).astype(np.float32) * 0.1

    ref = DINOLoss(K, student_temp=0.1, center_momentum=0.9)
    with torch.no_grad():
        ref.center = torch.from_numpy(center[None])
    t_probs_ref = ref.softmax_center_teacher(torch.from_numpy(t_logits), teacher_temp=0.07)
    loss_ref = ref(
        student_output_list=[torch.from_numpy(s_logits)],
        teacher_out_softmaxed_centered_list=[t_probs_ref],
    )
    # reference center EMA
    ref.update_center(torch.from_numpy(t_logits))
    ref.apply_center_update()

    t_probs = softmax_center_teacher(jnp.asarray(t_logits), jnp.asarray(center), 0.07)
    loss = dino_cross_entropy(jnp.asarray(s_logits), t_probs, 0.1)
    new_center = update_center(jnp.asarray(center), jnp.asarray(t_logits), 0.9)

    np.testing.assert_allclose(np.asarray(t_probs), t_probs_ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_center), ref.center.numpy()[0], atol=1e-6
    )


def test_sinkhorn_knopp_parity(rng):
    DINOLoss, _, _ = _ref_losses()
    K, B = 16, 8
    t_logits = rng.standard_normal((B, K)).astype(np.float32)
    ref = DINOLoss(K)
    q_ref = ref.sinkhorn_knopp_teacher(torch.from_numpy(t_logits), teacher_temp=0.07)
    q = sinkhorn_knopp_teacher(jnp.asarray(t_logits), 0.07, 3)
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), atol=1e-5)


def test_sinkhorn_zero_weight_columns_finite(rng):
    """Zero-weight columns (padding / fully-unmasked samples on the dense
    iBOT path) must not poison Q with NaN (advisor round-2 finding): zeroed
    columns stay zero, real columns still form a balanced assignment."""
    K, B = 16, 8
    t_logits = rng.standard_normal((B, K)).astype(np.float32)
    w = np.ones(B, np.float32)
    w[[0, 3, 7]] = 0.0
    q = np.asarray(sinkhorn_knopp_teacher(jnp.asarray(t_logits), 0.07, 3,
                                          sample_weight=jnp.asarray(w)))
    assert np.all(np.isfinite(q))
    np.testing.assert_allclose(q[w == 0.0], 0.0, atol=1e-12)
    # real rows are probability-like after the final *n_samples rescale
    np.testing.assert_allclose(q[w == 1.0].sum(), w.sum(), rtol=1e-3)
    # all-zero weights: degenerate but still finite
    q0 = np.asarray(sinkhorn_knopp_teacher(jnp.asarray(t_logits), 0.07, 3,
                                           sample_weight=jnp.zeros(B)))
    assert np.all(np.isfinite(q0))


def test_ibot_dense_equals_reference_masked(rng):
    _, iBOTPatchLoss, _ = _ref_losses()
    B, N, K = 4, 12, 16
    s = rng.standard_normal((B, N, K)).astype(np.float32)
    t = rng.standard_normal((B, N, K)).astype(np.float32)
    masks = rng.uniform(size=(B, N)) < 0.4
    masks[0] = False  # one unmasked sample (mask_sample_probability < 1)

    # reference path: gather masked tokens, masks_weight as in collate.py:40
    ref = iBOTPatchLoss(K, student_temp=0.1)
    mt = torch.from_numpy(masks)
    idx = mt.flatten().nonzero().flatten()
    s_m = torch.from_numpy(s.reshape(-1, K))[idx]
    t_m = torch.from_numpy(t.reshape(-1, K))[idx]
    masks_weight = (
        (1 / mt.sum(-1).clamp(min=1.0)).unsqueeze(-1).expand_as(mt)[mt]
    )
    loss_ref = ref.forward_masked(
        s_m, torch.softmax(t_m, dim=-1), student_masks_flat=mt,
        n_masked_patches=idx.numel(), masks_weight=masks_weight,
    )

    t_probs = jax.nn.softmax(jnp.asarray(t), axis=-1)
    loss = ibot_patch_loss_dense(jnp.asarray(s), t_probs, jnp.asarray(masks))
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)


def test_koleo_parity(rng):
    _, _, KoLeoLoss = _ref_losses()
    x = rng.standard_normal((10, 24)).astype(np.float32)
    ref = KoLeoLoss()(torch.from_numpy(x))
    ours = koleo_loss(jnp.asarray(x))
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-5)


def test_dino_head_weight_norm(rng):
    head = DINOHead(in_dim=16, out_dim=24, hidden_dim=32, bottleneck_dim=8,
                    nlayers=3, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, 16)).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(variables, x)
    assert out.shape == (5, 24)
    # g initialised to 1 => every prototype row of the effective weight is
    # unit-norm, and the head input to the prototypes is L2-normalized =>
    # logits are cosines in [-1, 1]
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-5


def test_masking_generator_counts():
    gen = MaskingGenerator(input_size=8, min_num_patches=4, seed=3)
    for want in (0, 8, 20, 32):
        m = gen(want)
        assert m.shape == (8, 8)
        assert m.sum() <= max(want, 0) + 16  # grows in blocks, bounded overshoot
        if want >= 8:
            assert m.sum() > 0


def test_collate_multicrop_shapes():
    cfg = MultiCropConfig(global_crop_size=56, local_crop_size=28, n_local_crops=3)
    aug = DataAugmentationDINO(cfg, seed=0)
    img = (np.random.default_rng(0).uniform(0, 255, (64, 80, 3))).astype(np.uint8)
    samples = [aug(img) for _ in range(4)]
    gen = MaskingGenerator(input_size=4, seed=0)  # 56/14 = 4 -> N=16
    batch = collate_multicrop(samples, gen, mask_ratio=(0.3, 0.6),
                              mask_probability=0.5, seed=0)
    assert batch["global_crops"].shape == (8, 56, 56, 3)
    assert batch["local_crops"].shape == (12, 28, 28, 3)
    assert batch["masks"].shape == (8, 16)
    assert batch["masks"].dtype == bool
    # crop-major stacking: rows [0:4] are crop0 of each sample
    assert batch["masks"].any()  # half the batch gets masked


def _tiny_arch():
    cfg = SSLConfig(
        global_crop_size=56, local_crop_size=28, n_local_crops=2,
        dino_out_dim=32, ibot_out_dim=32, head_hidden_dim=24,
        head_bottleneck_dim=12, head_nlayers=2, head_dtype="float32",
        warmup_iters=2, total_iters=50, warmup_teacher_temp_iters=4,
        freeze_last_layer_iters=2, lr=1e-3,
    )
    bcfg = DinoV2Config(embed_dim=32, depth=2, num_heads=2, patch_size=14,
                        img_size=56)
    return SSLMetaArch(cfg, bcfg)


def _tiny_batch(rng, B=2, n_local=2, g=56, l=28, n_tokens=16):
    masks = np.zeros((2 * B, n_tokens), bool)
    masks[0, :6] = True
    masks[2, 4:12] = True
    return {
        "global_crops": jnp.asarray(rng.standard_normal((2 * B, g, g, 3)).astype(np.float32)),
        "local_crops": jnp.asarray(rng.standard_normal((n_local * B, l, l, 3)).astype(np.float32)),
        "masks": jnp.asarray(masks),
    }


@pytest.mark.slow
def test_ssl_train_step(rng):
    arch = _tiny_arch()
    state = arch.init_state(jax.random.PRNGKey(0))
    mults = arch.multipliers(state)
    batch = _tiny_batch(rng)
    step = jax.jit(lambda s, b: arch.train_step(s, b, mults=mults))

    t0 = state.teacher
    metrics_hist = []
    for _ in range(3):
        state, metrics = step(state, batch)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    assert int(state.step) == 3
    for m in metrics_hist:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    assert m["dino_global_crops_loss"] > 0
    assert m["ibot_loss"] > 0
    # teacher moved toward the student (EMA)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), t0, state.teacher
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # centers updated
    assert float(jnp.max(jnp.abs(state.dino_center))) > 0


def test_ssl_schedules_semantics():
    cfg = SSLConfig(warmup_iters=10, total_iters=100, lr=1e-3, min_lr=1e-5,
                    freeze_last_layer_iters=5, warmup_teacher_temp_iters=10)
    s0 = ssl_schedules(cfg, 0)
    s4 = ssl_schedules(cfg, 4)
    s5 = ssl_schedules(cfg, 5)
    s100 = ssl_schedules(cfg, 100)
    assert float(s0["lr"]) == 0.0
    assert float(s0["last_layer_lr"]) == 0.0  # frozen
    assert 0 < float(s5["lr"]) < cfg.lr
    assert float(s4["last_layer_lr"]) == 0.0  # frozen until freeze_last_layer_iters
    assert float(s5["last_layer_lr"]) == float(s5["lr"])  # unfrozen from step 5
    assert abs(float(s100["lr"]) - cfg.min_lr) < 1e-7
    assert float(s100["teacher_temp"]) == pytest.approx(cfg.teacher_temp)
    assert float(s0["teacher_temp"]) == pytest.approx(cfg.warmup_teacher_temp)


def test_group_multipliers(rng):
    arch = _tiny_arch()
    state = arch.init_state(jax.random.PRNGKey(0))
    lr_m, wd_m, last_f = build_group_multipliers(
        state.student, arch.cfg, arch.backbone_cfg.depth
    )
    d = arch.cfg.layerwise_decay
    depth = arch.backbone_cfg.depth
    # patch embed: layer 0 decay * patch_embed mult
    pe = float(lr_m["backbone"]["patch_embed"]["kernel"])
    assert pe == pytest.approx(d ** (depth + 1) * arch.cfg.patch_embed_lr_mult)
    # block 0 < block 1 lr
    b0 = float(lr_m["backbone"]["block_0"]["attn"]["qkv"]["kernel"])
    b1 = float(lr_m["backbone"]["block_1"]["attn"]["qkv"]["kernel"])
    assert b0 < b1 < 1.0
    # heads: no decay
    assert float(lr_m["dino_head"]["mlp_0"]["kernel"]) == 1.0
    # wd masks: biases/norms/tokens 0, kernels 1
    assert float(wd_m["backbone"]["block_0"]["norm1"]["scale"]) == 0.0
    assert float(wd_m["backbone"]["cls_token"]) == 0.0
    assert float(wd_m["backbone"]["block_0"]["attn"]["qkv"]["kernel"]) == 1.0
    # last-layer flags only on the prototype layer
    assert float(last_f["dino_head"]["last_v"]) == 1.0
    assert float(last_f["dino_head"]["mlp_0"]["kernel"]) == 0.0


@pytest.mark.slow
def test_ssl_driver_smoke(tmp_path, rng):
    """train_ssl end-to-end: image folder -> loader -> 2 jitted steps ->
    checkpoint + resume."""
    import cv2

    from pope_tpu.train.ssl_driver import train_ssl

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        cv2.imwrite(
            str(img_dir / f"{i}.png"),
            rng.uniform(0, 255, (80, 96, 3)).astype(np.uint8),
        )
    arch = _tiny_arch()
    ckpt = tmp_path / "ckpt"
    state = train_ssl(
        str(img_dir), arch.cfg, arch.backbone_cfg, batch_size=2,
        total_steps=2, ckpt_dir=str(ckpt), ckpt_every=10, log_every=1,
    )
    assert int(state.step) == 2
    # resume picks up the saved step-2 checkpoint and runs 1 more step
    state2 = train_ssl(
        str(img_dir), arch.cfg, arch.backbone_cfg, batch_size=2,
        total_steps=3, ckpt_dir=str(ckpt), ckpt_every=10, log_every=1,
    )
    assert int(state2.step) == 3


def test_ssl_batches_advance_across_epochs(tmp_path, rng):
    """Augmentation/mask streams must differ between epochs (advisor
    round-2 finding: a fixed per-epoch seed replayed identical crops)."""
    import cv2

    from pope_tpu.train.ssl import SSLConfig
    from pope_tpu.train.ssl_driver import make_ssl_batches

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        cv2.imwrite(
            str(img_dir / f"{i}.png"),
            rng.uniform(0, 255, (80, 96, 3)).astype(np.uint8),
        )
    cfg = SSLConfig(global_crop_size=56, local_crop_size=14, n_local_crops=2,
                    mask_ratio_min=0.4, mask_ratio_max=0.6,
                    mask_sample_probability=1.0)
    # batch_size == n_images => one batch per epoch; batch 2 is epoch 1
    it = make_ssl_batches(str(img_dir), cfg, batch_size=2, seed=0,
                          num_workers=1)
    b0, b1 = next(it), next(it)
    assert not np.allclose(b0["global_crops"], b1["global_crops"])
    assert not np.array_equal(b0["masks"], b1["masks"])


@pytest.mark.slow
def test_ssl_driver_dp_mesh(tmp_path, rng):
    """train_ssl with a dp mesh (the `cli train-ssl --dp 8` path): sharded
    batches + FSDP-sharded state through the driver loop."""
    import cv2

    from pope_tpu.parallel import make_mesh
    from pope_tpu.train.ssl_driver import train_ssl

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        cv2.imwrite(
            str(img_dir / f"{i}.png"),
            rng.uniform(0, 255, (64, 72, 3)).astype(np.uint8),
        )
    arch = _tiny_arch()
    state = train_ssl(
        str(img_dir), arch.cfg, arch.backbone_cfg, batch_size=4,
        total_steps=2, log_every=1, mesh=make_mesh(8, tp=1),
    )
    assert int(state.step) == 2


@pytest.mark.slow
def test_ssl_sharded_step_matches_single(rng):
    from pope_tpu.parallel import make_mesh

    arch = _tiny_arch()
    state = arch.init_state(jax.random.PRNGKey(0))
    mults = arch.multipliers(state)
    batch = _tiny_batch(rng, B=4)  # 8 global crops: divisible by dp=8? crops axis is 2B=8

    # single-device result
    _, m_single = jax.jit(lambda s, b: arch.train_step(s, b, mults=mults))(state, batch)

    mesh = make_mesh(8, tp=1)  # dp=8
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded_batch = {
        k: jax.device_put(v, NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1)))))
        for k, v in batch.items()
    }
    s_state = shard_ssl_state(state, mesh)
    step = make_sharded_ssl_step(arch, mesh, mults=mults)
    new_state, m_sharded = step(s_state, sharded_batch)
    jax.block_until_ready(new_state)

    for k in ("dino_global_crops_loss", "dino_local_crops_loss", "ibot_loss"):
        np.testing.assert_allclose(
            float(m_sharded[k]), float(m_single[k]), rtol=2e-4, atol=2e-5
        )
    # koleo's nearest-neighbour argmax flips on near-tied dots when the
    # partitioned forward reorders f32 reductions (untrained cls tokens are
    # nearly identical); compare loosely
    np.testing.assert_allclose(
        float(m_sharded["koleo_loss"]), float(m_single["koleo_loss"]), rtol=0.05
    )


@pytest.mark.slow
def test_knn_and_linear_probe(rng):
    """SSL eval protocols on synthetic class blobs: knn voting semantics
    (incl. parity with the reference's softmax(sims/T) weighted vote) and
    linear-probe convergence."""
    from pope_tpu.train.ssl_eval import (
        knn_accuracy, knn_classify, linear_probe_accuracy, train_linear_probe,
    )

    D, C, n_per = 16, 3, 40
    centers = rng.standard_normal((C, D)).astype(np.float32) * 3
    feats, labels = [], []
    for c in range(C):
        feats.append(centers[c] + 0.5 * rng.standard_normal((n_per, D)).astype(np.float32))
        labels.append(np.full(n_per, c))
    feats = np.concatenate(feats)
    labels = np.concatenate(labels)
    feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    perm = rng.permutation(len(feats))
    tr, te = perm[:90], perm[90:]

    accs = knn_accuracy(
        jnp.asarray(feats[tr]), jnp.asarray(labels[tr]),
        jnp.asarray(feats[te]), jnp.asarray(labels[te]), nb_knn=(5, 10),
    )
    assert accs[5] > 0.9 and accs[10] > 0.9, accs

    # reference vote semantics on a micro case: softmax(sims/T)-weighted
    # one-hot sums over the top-k
    probas = knn_classify(
        jnp.asarray(feats[tr]), jnp.asarray(labels[tr]), jnp.asarray(feats[te[:4]]),
        nb_knn=(5,), T=0.07, num_classes=C,
    )[5]
    sims = feats[te[:4]] @ feats[tr].T
    top = np.argsort(-sims, axis=1)[:, :5]
    w = np.exp(np.take_along_axis(sims, top, 1) / 0.07)
    w = w / w.sum(1, keepdims=True)
    expect = np.zeros((4, C))
    for i in range(4):
        for j in range(5):
            expect[i, labels[tr][top[i, j]]] += w[i, j]
    np.testing.assert_allclose(np.asarray(probas), expect, atol=1e-4)

    params, losses = train_linear_probe(
        jnp.asarray(feats[tr]), jnp.asarray(labels[tr]), num_classes=C,
        steps=300, batch_size=64,
    )
    assert losses[-1] < losses[0] * 0.5
    acc = linear_probe_accuracy(params, jnp.asarray(feats[te]), jnp.asarray(labels[te]))
    assert acc > 0.9, acc

    # log-regression protocol: the l2 sweep picks a classifier that
    # separates the blobs, and a huge l2 is rejected by the val split
    from pope_tpu.train.ssl_eval import log_regression_accuracy

    test_acc, best_l2, val_accs = log_regression_accuracy(
        jnp.asarray(feats[tr]), jnp.asarray(labels[tr]),
        jnp.asarray(feats[te]), jnp.asarray(labels[te]),
        l2_values=(1e-4, 1e-2, 1e2), steps=300, num_classes=C,
    )
    assert test_acc > 0.9, (test_acc, val_accs)
    assert best_l2 != 1e2, val_accs


def test_animator_headless(tmp_path):
    """pose/animator.py equivalent: incremental add() + headless save()."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from pope_tpu.utils.animator import Animator

    an = Animator(xlabel="step", ylabel="loss", legend=["train", "val"])
    for i in range(5):
        an.add(i, [1.0 / (i + 1), 1.2 / (i + 1)])
    assert len(an.X[0]) == 5 and len(an.Y) == 2
    out = tmp_path / "curve.png"
    an.save(str(out))
    an.close()
    assert out.exists() and out.stat().st_size > 1000
