"""Numerical parity of the flax matcher vs the reference PyTorch matcher
(random weights, converted). The reference implementation acts as the oracle;
tolerances are loose-ish because the coarse transformer accumulates f32
reduction-order differences over 8 layers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from pope_tpu.config import CoarseMatchConfig, MatcherConfig
from pope_tpu.models.matcher import Matcher, convert_torch_matcher_state
from tests.torch_ref import load_reference_matcher


@pytest.fixture(scope="module")
def ref_and_ours():
    ref, sd = load_reference_matcher(seed=3)
    variables = convert_torch_matcher_state(sd)
    cfg = MatcherConfig(match_coarse=CoarseMatchConfig(match_capacity=256))
    ours = Matcher(cfg)
    return ref, variables, ours, cfg


def _rand_pair(rng, h0=64, w0=96, h1=64, w1=64):
    img0 = rng.uniform(0, 1, (1, h0, w0, 1)).astype(np.float32)
    img1 = rng.uniform(0, 1, (1, h1, w1, 1)).astype(np.float32)
    return img0, img1


def test_backbone_parity(ref_and_ours, rng):
    ref, variables, ours, cfg = ref_and_ours
    img0, _ = _rand_pair(rng)
    with torch.no_grad():
        tc, tf = ref.backbone(torch.from_numpy(img0.transpose(0, 3, 1, 2)))
    from pope_tpu.models.matcher.backbone import ResNetFPN

    bb = ResNetFPN(initial_dim=128, block_dims=(128, 196, 256))
    out_c, out_f = bb.apply(
        {"params": variables["params"]["backbone"], "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(img0),
    )
    np.testing.assert_allclose(
        np.asarray(out_c), tc.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_f), tf.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )


def test_pos_encoding_parity(ref_and_ours):
    ref, *_ = ref_and_ours
    from pope_tpu.models.matcher.transformer import sine_position_encoding

    pe_ref = ref.pos_encoding.pe[0, :, :32, :40].numpy()  # (C, h, w)
    pe_ours = np.asarray(sine_position_encoding(32, 40, 256, temp_bug_fix=False))
    np.testing.assert_allclose(pe_ours.transpose(2, 0, 1), pe_ref, atol=1e-5)


@pytest.mark.slow
def test_full_matcher_parity(ref_and_ours, rng):
    """End-to-end: same images through both matchers -> same match set."""
    ref, variables, ours, cfg = ref_and_ours
    img0, img1 = _rand_pair(rng)

    batch = {
        "image0": torch.from_numpy(img0.transpose(0, 3, 1, 2)),
        "image1": torch.from_numpy(img1.transpose(0, 3, 1, 2)),
    }
    with torch.no_grad():
        ref(batch)
    ref_pts0 = batch["mkpts0_f"].numpy()
    ref_pts1 = batch["mkpts1_f"].numpy()
    ref_conf = batch["mconf"].numpy()

    res = ours.apply(variables, jnp.asarray(img0), jnp.asarray(img1))
    ok = np.asarray(res.valid[0])
    our_pts0 = np.asarray(res.mkpts0[0])[ok]
    our_pts1 = np.asarray(res.mkpts1[0])[ok]
    our_conf = np.asarray(res.mconf[0])[ok]

    assert len(our_pts0) == len(ref_pts0), (len(our_pts0), len(ref_pts0))
    if len(ref_pts0) == 0:
        return
    # order-insensitive comparison: sort both by (x0, y0)
    def order(p):
        return np.lexsort((p[:, 1], p[:, 0]))

    ro, oo = order(ref_pts0), order(our_pts0)
    np.testing.assert_allclose(our_pts0[oo], ref_pts0[ro], atol=1e-3)
    np.testing.assert_allclose(our_conf[oo], ref_conf[ro], atol=1e-3, rtol=1e-3)
    # fine coords: sub-pixel; allow small tolerance
    np.testing.assert_allclose(our_pts1[oo], ref_pts1[ro], atol=0.05)


def test_matcher_jits_and_static_shapes(ref_and_ours, rng):
    ref, variables, ours, cfg = ref_and_ours
    img0, img1 = _rand_pair(rng, 64, 64, 64, 64)
    fn = jax.jit(lambda v, a, b: ours.apply(v, a, b))
    res = fn(variables, jnp.asarray(img0), jnp.asarray(img1))
    L = (64 // 8) * (64 // 8)
    M = min(cfg.match_coarse.match_capacity, L)
    assert res.mkpts0.shape == (1, M, 2)
    assert res.mconf.shape == (1, M)
    res2 = fn(variables, jnp.asarray(img1), jnp.asarray(img0))
    assert np.isfinite(np.asarray(res2.mkpts1)).all()
