"""Released-checkpoint manifest tests (VERDICT r3 #7).

The container ships no real weights, so these tests pin the structural
contract instead: (a) the stored manifests match the reference torch module
definitions exactly (regenerated at test time), (b) a state dict with
exactly the manifest inventory converts into a variable tree whose
structure+shapes equal the flax model's own init at FULL released scale,
(c) unknown/missing/misshapen keys fail loudly by name.

Reference: pope_model_api.py:177-185 (matcher.pth 'matcher.' prefix),
segment_anything/build_sam.py:102-105, dinov2/dinov2/utils/utils.py:21.
"""

import dataclasses

import numpy as np
import pytest
import jax

from pope_tpu.utils.state_manifest import (
    MANIFESTS,
    StateDictMismatch,
    check_state_dict,
    load_state_manifest,
    synthesize_state_dict,
)


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def test_manifests_exist_and_are_sane():
    for name in MANIFESTS:
        m = load_state_manifest(name)
        assert len(m) > 100, name
        assert all(isinstance(s, tuple) for s in m.values())
    # spot-check a few known released shapes
    sam_h = load_state_manifest("sam_vit_h")
    assert sam_h["image_encoder.patch_embed.proj.weight"] == (1280, 3, 16, 16)
    assert sam_h["image_encoder.blocks.31.attn.qkv.weight"] == (3840, 1280)
    assert sam_h["mask_decoder.iou_token.weight"] == (1, 256)
    d = load_state_manifest("dinov2_vits14")
    assert d["patch_embed.proj.weight"] == (384, 3, 14, 14)
    assert d["pos_embed"] == (1, 1370, 384)  # 518/14 = 37 -> 37^2 + 1
    mm = load_state_manifest("matcher")
    assert mm["matcher.backbone.conv1.weight"] == (128, 1, 7, 7)


def test_check_state_dict_fails_loudly():
    sd = synthesize_state_dict("dinov2_vits14")
    check_state_dict(sd, "dinov2_vits14")  # exact inventory passes

    missing = dict(sd)
    del missing["blocks.3.attn.qkv.weight"]
    with pytest.raises(StateDictMismatch, match="blocks.3.attn.qkv.weight"):
        check_state_dict(missing, "dinov2_vits14")

    extra = dict(sd)
    extra["decoder.head.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(StateDictMismatch, match="decoder.head.weight"):
        check_state_dict(extra, "dinov2_vits14")

    wrong = dict(sd)
    wrong["cls_token"] = np.zeros((1, 1, 99), np.float32)
    with pytest.raises(StateDictMismatch, match="cls_token"):
        check_state_dict(wrong, "dinov2_vits14")

    # known-optional rider keys don't trip the matcher check (strict=False
    # in the reference tolerates the OT dustbin param)
    msd = synthesize_state_dict("matcher")
    msd["matcher.coarse_matching.bin_score"] = np.zeros((), np.float32)
    check_state_dict(msd, "matcher")


def test_dinov2_manifest_converts_to_init_structure():
    """A dict with exactly the released dinov2_vits14 inventory must convert
    into the same tree structure+shapes as DinoVisionTransformer.init."""
    import jax.numpy as jnp

    from pope_tpu.config import DinoV2Config
    from pope_tpu.models.dinov2 import DinoVisionTransformer, convert_torch_dinov2_state

    cfg = DinoV2Config()
    assert cfg.depth == 12 and cfg.embed_dim == 384, "default must be vits14"
    model = DinoVisionTransformer(cfg)
    sd = synthesize_state_dict("dinov2_vits14")
    converted = convert_torch_dinov2_state(sd, depth=cfg.depth)
    init = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 196, 196, 3))), jax.random.PRNGKey(0)
    )
    got = _tree_shapes(converted["params"])
    want = _tree_shapes(jax.tree_util.tree_map(lambda x: x, init["params"]))
    assert set(got) == set(want), (
        sorted(set(want) - set(got)), sorted(set(got) - set(want)))
    mism = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    # pos_embed ships at the 518-px pretrain grid and is interpolated at
    # apply time; everything else must match the init shape exactly
    mism.pop("pos_embed", None)
    assert not mism, mism


def test_matcher_manifest_converts_to_init_structure():
    import jax.numpy as jnp

    from pope_tpu.config import MatcherConfig
    from pope_tpu.models.matcher import Matcher, convert_torch_matcher_state

    model = Matcher(MatcherConfig())
    sd = synthesize_state_dict("matcher")
    # BN running_var must be positive for apply; structure test only needs
    # shapes, but keep the dict numerically valid anyway
    for k in sd:
        if k.endswith("running_var"):
            sd[k] = sd[k] + 1.0
    converted = convert_torch_matcher_state(sd)
    init = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1))),
        jax.random.PRNGKey(0),
    )
    for col in ("params", "batch_stats"):
        got = _tree_shapes(converted[col])
        want = _tree_shapes(jax.tree_util.tree_map(lambda x: x, init[col]))
        assert set(got) == set(want), (
            col, sorted(set(want) - set(got)), sorted(set(got) - set(want)))
        mism = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
        assert not mism, (col, mism)


def test_sam_vit_h_manifest_converts_to_init_structure():
    """Full released-scale vit_h: the exact sam_vit_h_4b8939.pth inventory
    must convert into Sam.init's structure (catches depth/global-index/
    window mismatches that small-scale parity can't)."""
    import jax.numpy as jnp

    from pope_tpu.config import SamConfig, SamEncoderConfig
    from pope_tpu.models.sam import Sam, convert_torch_sam_state

    cfg = dataclasses.replace(SamConfig(), encoder=SamEncoderConfig.vit_h())
    sam = Sam(cfg)
    sd = synthesize_state_dict("sam_vit_h")
    converted = convert_torch_sam_state(sd, depth=cfg.encoder.depth)
    S = cfg.encoder.img_size
    init = jax.eval_shape(
        lambda r: sam.init(
            r, jnp.zeros((S, S, 3)), (S, S),
            jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32),
        ),
        jax.random.PRNGKey(0),
    )
    got = _tree_shapes(converted["params"])
    want = _tree_shapes(jax.tree_util.tree_map(lambda x: x, init["params"]))
    # init traces with masks=None, so the prompt encoder's mask-downscaling
    # branch creates no params there; the converter must still carry those
    # weights for mask-prompt consumers (predictor mask_input)
    extra = set(got) - set(want)
    assert all(k.startswith("prompt_encoder/mask_") for k in extra), sorted(extra)[:8]
    assert not (set(want) - set(got)), sorted(set(want) - set(got))[:8]
    mism = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mism, dict(list(mism.items())[:8])


def test_manifests_match_reference_modules():
    """Regenerate each manifest from the reference torch module definitions
    and require exact equality with the stored snapshots."""
    import sys

    import torch

    from tests.torch_ref import _install_stubs, _install_torchvision_stub

    _install_torchvision_stub()
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    from segment_anything.segment_anything import build_sam_vit_h

    with torch.device("meta"):
        sam = build_sam_vit_h(checkpoint=None)
    got = {k: tuple(v.shape) for k, v in sam.state_dict().items()}
    assert got == load_state_manifest("sam_vit_h")

    from src.matcher import Matcher as RefMatcher, default_cfg

    mm = RefMatcher(config=default_cfg)
    got = {f"matcher.{k}": tuple(v.shape) for k, v in mm.state_dict().items()}
    assert got == load_state_manifest("matcher")

    from dinov2.dinov2.models.vision_transformer import vit_small

    vs = vit_small(patch_size=14, img_size=518, init_values=1.0, block_chunks=0)
    got = {k: tuple(v.shape) for k, v in vs.state_dict().items()}
    assert got == load_state_manifest("dinov2_vits14")
