"""Matcher training infra tests: supervision parity with the reference
semantics on synthetic depth, loss behavior, and a full sharded train step
over the 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pope_tpu.config import BackboneConfig, CoarseMatchConfig, LoFTRStageConfig, MatcherConfig
from pope_tpu.models.matcher import Matcher
from pope_tpu.parallel import make_mesh, shard_batch, shard_params_tp
from pope_tpu.train import (
    build_optimizer,
    coarse_loss,
    fine_loss,
    matcher_train_step,
    make_sharded_train_step,
    spvs_coarse,
    warp_kpts,
)
from pope_tpu.train.loss import LossConfig
from pope_tpu.train.optim import OptimConfig
from pope_tpu.train.trainer import init_matcher_train_state


def _synth_batch(rng, B=2, H=64, W=64):
    """Fronto-parallel plane at depth 2 with a pure translation: warps are
    exactly computable."""
    img0 = rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32)
    img1 = rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32)
    depth = np.full((B, H, W), 2.0, np.float32)
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.2  # x-shift -> 10px at f=100, z=2
    Tinv = np.linalg.inv(T)
    return {
        "image0": jnp.asarray(img0),
        "image1": jnp.asarray(img1),
        "depth0": jnp.asarray(depth),
        "depth1": jnp.asarray(depth),
        "T_0to1": jnp.asarray(np.tile(T, (B, 1, 1))),
        "T_1to0": jnp.asarray(np.tile(Tinv, (B, 1, 1))),
        "K0": jnp.asarray(np.tile(K, (B, 1, 1))),
        "K1": jnp.asarray(np.tile(K, (B, 1, 1))),
    }


def test_warp_kpts_translation(rng):
    b = _synth_batch(rng)
    kpts = jnp.asarray([[[20.0, 30.0], [40.0, 10.0]]])
    valid, warped = warp_kpts(
        kpts, b["depth0"][:1], b["depth1"][:1], b["T_0to1"][:1, :3], b["K0"][:1], b["K1"][:1]
    )
    # x shifted by f*tx/z = 100*0.2/2 = 10px
    np.testing.assert_allclose(np.asarray(warped)[0, :, 0], [30.0, 50.0], atol=1e-2)  # +1e-4 depth guard
    np.testing.assert_allclose(np.asarray(warped)[0, :, 1], [30.0, 10.0], atol=1e-2)
    assert bool(valid[0, 0]) and bool(valid[0, 1])


def test_spvs_coarse_translation(rng):
    b = _synth_batch(rng)
    spv = spvs_coarse(b, coarse_scale=8)
    conf_gt = np.asarray(spv["conf_matrix_gt"])
    assert conf_gt.shape == (2, 64, 64)
    # 10px shift = 1.25 coarse cells; each valid row matches the cell one to
    # the right (rounded)
    b_ids, i_ids = np.nonzero(np.asarray(spv["spv_valid"]))
    assert len(b_ids) > 0
    j_ids = np.asarray(spv["spv_j_of_i"])[b_ids, i_ids]
    di = j_ids - i_ids
    assert (di == 1).mean() > 0.9  # most matches shifted one cell in x


def test_coarse_loss_prefers_gt(rng):
    gt = jnp.zeros((1, 16, 16)).at[0, 3, 5].set(1.0)
    good = jnp.clip(gt * 0.9 + 0.01, 0, 1)
    bad = jnp.full((1, 16, 16), 0.5)
    assert float(coarse_loss(good, gt)) < float(coarse_loss(bad, gt))


def test_fine_loss_masks_invalid():
    pred = jnp.zeros((1, 4, 3)).at[..., 2].set(1.0)
    gt = jnp.asarray([[[0.1, 0.1], [5.0, 5.0], [0.2, 0.0], [0.0, 0.0]]])
    valid = jnp.asarray([[True, True, False, False]])
    # only slot 0 contributes (slot 1 outside window, 2/3 invalid); use the
    # plain l2 flavor for an exact expectation (l2_with_std renormalizes)
    loss = float(fine_loss(pred, gt, valid, LossConfig(fine_type="l2")))
    expected = 0.1**2 + 0.1**2
    assert abs(loss - expected) < 1e-5
    loss_std = float(fine_loss(pred, gt, valid))
    assert np.isfinite(loss_std) and loss_std > 0


def _tiny_matcher():
    return Matcher(
        MatcherConfig(
            backbone=BackboneConfig(initial_dim=16, block_dims=(16, 24, 32)),
            coarse=LoFTRStageConfig(d_model=32, d_ffn=32, nhead=2, layer_names=("self", "cross")),
            fine=LoFTRStageConfig(d_model=16, d_ffn=16, nhead=2, layer_names=("self", "cross")),
            match_coarse=CoarseMatchConfig(match_capacity=32),
        )
    )


@pytest.mark.slow
def test_matcher_train_step_runs_and_descends(rng):
    matcher = _tiny_matcher()
    tx = build_optimizer(OptimConfig(lr=1e-3, warmup_steps=0, scheduler="ExponentialLR", elr_gamma=1.0))
    batch = _synth_batch(rng)
    state = init_matcher_train_state(matcher, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(lambda s, b: matcher_train_step(matcher, tx, s, b))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_gt_pad_matches_semantics():
    """GT pads the reserved tail and every invalid predicted slot; GT pads
    carry mconf=0 (coarse_matching.py:200-236 static-shape analogue)."""
    from pope_tpu.models.matcher.matching import CoarseMatches, gt_pad_matches

    B, M, L = 1, 8, 64
    cm = CoarseMatches(
        i_ids=jnp.arange(M)[None] + 10,
        j_ids=jnp.arange(M)[None] + 20,
        mconf=jnp.full((B, M), 0.5),
        valid=jnp.asarray([[True, True, False, True, False, True, True, True]]),
    )
    gt_valid = jnp.zeros((B, L), bool).at[0, jnp.asarray([3, 7, 31])].set(True)
    gt_j = jnp.arange(L)[None] * 2 % L
    out = gt_pad_matches(cm, gt_valid, gt_j, gt_min=2)
    v = np.asarray(out.valid)[0]
    mc = np.asarray(out.mconf)[0]
    ii = np.asarray(out.i_ids)[0]
    # slots 6,7 reserved for GT; slots 2,4 (invalid preds) replaced by GT
    for s in (2, 4, 6, 7):
        assert v[s] and mc[s] == 0.0, (s, v[s], mc[s])
        assert bool(gt_valid[0, ii[s]]), f"slot {s} must hold a GT row"
        assert np.asarray(out.j_ids)[0, s] == int(gt_j[0, ii[s]])
    # untouched predicted slots keep their match + conf
    for s in (0, 1, 3, 5):
        assert v[s] and mc[s] == 0.5 and ii[s] == s + 10


def test_coarse_matching_reports_dropped_matches():
    """'No silent caps': when more mutual-NN matches pass the threshold than
    the static capacity holds, n_dropped reports the overflow."""
    from pope_tpu.models.matcher.matching import coarse_matching

    h = w = 8  # 64 cells; border_rm=2 leaves a 4x4=16-cell interior
    L = S = h * w
    # identity-like confidence: every cell matches itself with conf 0.9
    conf = jnp.eye(L)[None] * 0.9 + 1e-4
    cm = coarse_matching(conf, (h, w), (h, w), thr=0.2, border_rm=2, capacity=10)
    n_kept = int(jnp.sum(cm.valid))
    assert n_kept == 10
    assert int(cm.n_dropped[0]) == 16 - 10
    # with enough capacity nothing is dropped
    cm2 = coarse_matching(conf, (h, w), (h, w), thr=0.2, border_rm=2, capacity=32)
    assert int(jnp.sum(cm2.valid)) == 16
    assert int(cm2.n_dropped[0]) == 0


@pytest.mark.slow
def test_fine_loss_has_signal_from_step0(rng):
    """With GT padding the fine stage sees supervised windows even when the
    fresh-init predictions are pure noise: loss_fine must be meaningfully
    nonzero at step 0 and decrease under training."""
    matcher = _tiny_matcher()
    tx = build_optimizer(OptimConfig(lr=2e-3, warmup_steps=0, scheduler="ExponentialLR", elr_gamma=1.0))
    batch = _synth_batch(rng)
    state = init_matcher_train_state(matcher, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(lambda s, b: matcher_train_step(matcher, tx, s, b))
    fine_losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        fine_losses.append(float(metrics["loss_fine"]))
    assert fine_losses[0] > 1e-4, f"no fine signal at step 0: {fine_losses}"
    assert np.isfinite(fine_losses).all()
    assert min(fine_losses[1:]) < fine_losses[0], fine_losses


@pytest.mark.slow
def test_sinkhorn_matcher_option(rng):
    """match_type='sinkhorn' (coarse_matching.py:121-143): learns a dustbin
    param, produces a sane confidence assignment, and matches identical
    images mostly to themselves."""
    from pope_tpu.models.matcher.matching import sinkhorn_confidence

    # identity check at the op level
    f = jnp.asarray(rng.normal(0, 1, (1, 24, 16)), jnp.float32) * 3.0
    conf = sinkhorn_confidence(f, f, bin_score=jnp.asarray(1.0), iters=10)
    diag_best = (np.argmax(np.asarray(conf)[0], axis=1) == np.arange(24)).mean()
    assert diag_best > 0.9
    assert np.asarray(conf).min() >= 0 and np.isfinite(np.asarray(conf)).all()

    # module-level: builds, runs, trains
    import dataclasses as dc

    cfg = _tiny_matcher().config
    cfg = dc.replace(cfg, match_coarse=dc.replace(cfg.match_coarse, match_type="sinkhorn"))
    matcher = Matcher(cfg)
    batch = _synth_batch(rng)
    variables = matcher.init(jax.random.PRNGKey(0), batch["image0"], batch["image1"])
    assert "bin_score" in variables["params"]
    res = matcher.apply(variables, batch["image0"], batch["image1"])
    assert np.isfinite(np.asarray(res.mconf)).all()
    tx = build_optimizer(OptimConfig(lr=1e-3, warmup_steps=0, scheduler="ExponentialLR", elr_gamma=1.0))
    state = init_matcher_train_state(matcher, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(lambda s, b: matcher_train_step(matcher, tx, s, b))
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses


@pytest.mark.slow
def test_sharded_train_step_8dev(rng):
    matcher = _tiny_matcher()
    tx = build_optimizer(OptimConfig(lr=1e-4, warmup_steps=0))
    mesh = make_mesh(8)
    batch = _synth_batch(rng, B=8)
    state = init_matcher_train_state(matcher, tx, jax.random.PRNGKey(0), batch)
    with mesh:
        sharded_batch = shard_batch(mesh, batch)
        state = state._replace(params=shard_params_tp(mesh, state.params))
        step = make_sharded_train_step(matcher, tx, mesh)
        new_state, metrics = step(state, sharded_batch)
        jax.block_until_ready(new_state.params)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_sam_encoder_tp_sharded_inference(rng):
    """Tensor-parallel INFERENCE of the SAM encoder over a (dp, tp) mesh:
    tp-sharded kernels + dp-sharded image batch reproduce the single-device
    embeddings (the SPMD partitioner inserts the collectives). Latency
    scaling axis the reference's 2-GPU placement cannot express."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pope_tpu.models.sam.encoder import ImageEncoderViT
    from pope_tpu.parallel import make_mesh, shard_params_tp
    from tests.test_sam_parity import TEST_CFG

    enc = ImageEncoderViT(TEST_CFG.encoder)
    imgs = jnp.asarray(rng.uniform(-1, 1, (4, 256, 256, 3)).astype(np.float32))
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), imgs)
    ref = jax.jit(enc.apply)(variables, imgs)

    mesh = make_mesh(8, tp=2)  # dp=4, tp=2
    with mesh:
        vs = {"params": shard_params_tp(mesh, variables["params"], min_size=256)}
        x = jax.device_put(imgs, NamedSharding(mesh, P("dp")))
        out = jax.jit(enc.apply)(vs, x)
        jax.block_until_ready(out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)
