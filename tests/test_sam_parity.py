"""Parity of the flax SAM stack vs the reference implementation (random
weights, converted) on a shrunken config: encoder (window + global rel-pos
attention), prompt encoder, mask decoder, and end-to-end point prompting."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from pope_tpu.config import SamConfig, SamEncoderConfig
from pope_tpu.models.sam import Sam, convert_torch_sam_state
from tests.torch_ref import load_reference_sam

pytestmark = pytest.mark.slow  # heavy oracle/e2e surface; core suite skips

TEST_CFG = SamConfig(
    encoder=SamEncoderConfig(
        img_size=256, patch_size=16, embed_dim=64, depth=4, num_heads=2,
        window_size=4, global_attn_indexes=(1, 3), out_chans=64, dtype="float32",
        gelu="erf",
    ),
    prompt_embed_dim=64,
    image_embedding_size=16,
    decoder_num_heads=2,
    decoder_mlp_dim=256,
    iou_head_hidden_dim=64,
    decoder_dtype="float32",  # numerical parity vs the torch f32 oracle
)


@pytest.fixture(scope="module")
def sam_pair():
    ref, sd = load_reference_sam(seed=5, size="test")
    variables = convert_torch_sam_state(sd, depth=4)
    ours = Sam(TEST_CFG)
    return ref, variables, ours


def test_encoder_parity(sam_pair, rng):
    ref, variables, ours = sam_pair
    img = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        emb_ref = ref.image_encoder(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    emb = ours.apply(variables, jnp.asarray(img), method=ours.encode_image)
    np.testing.assert_allclose(
        np.asarray(emb), emb_ref.numpy().transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-2
    )


def test_prompt_encoder_parity(sam_pair):
    ref, variables, ours = sam_pair
    pts = np.array([[[40.0, 80.0], [0.0, 0.0]]], np.float32)  # 1 fg + pad
    lbl_ref = torch.tensor([[1, -1]])
    with torch.no_grad():
        sparse_ref, dense_ref = ref.prompt_encoder(
            points=(torch.from_numpy(pts), lbl_ref), boxes=None, masks=None
        )

    def run(mdl, points, labels):
        return mdl.prompt_encoder(points, labels)

    sparse, dense = ours.apply(
        variables, jnp.asarray(pts), jnp.asarray([[1, -1]], jnp.int32), method=run
    )
    # the reference appends one extra pad slot when boxes are absent
    # (prompt_encoder.py:81-86); ours carries padding explicitly, so compare
    # the common slots
    np.testing.assert_allclose(
        np.asarray(sparse), sparse_ref.detach().numpy()[:, :2], atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dense), dense_ref.detach().numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


def test_end_to_end_point_prompt_parity(sam_pair, rng):
    """Full SAM: preprocessed image + single point prompt -> masks + iou."""
    ref, variables, ours = sam_pair
    img = rng.uniform(0, 255, (256, 256, 3)).astype(np.float32)

    pt = np.array([[[120.0, 140.0], [0.0, 0.0]]], np.float32)
    with torch.no_grad():
        x = ref.preprocess(torch.from_numpy(img.transpose(2, 0, 1)))
        emb_ref = ref.image_encoder(x[None])
        sparse_ref, dense_ref = ref.prompt_encoder(
            points=(torch.from_numpy(pt), torch.tensor([[1, -1]])), boxes=None, masks=None
        )
        masks_ref, iou_ref = ref.mask_decoder(
            image_embeddings=emb_ref,
            image_pe=ref.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse_ref,
            dense_prompt_embeddings=dense_ref,
            multimask_output=True,
        )

    masks, iou = ours.apply(
        variables,
        jnp.asarray(img),
        (256, 256),
        jnp.asarray(pt),
        jnp.asarray([[1, -1]], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(iou), iou_ref.numpy(), atol=5e-3, rtol=1e-2)
    # mask logits: compare with a tolerance; binarization agreement is only
    # meaningful away from zero (random weights put many logits within the
    # numerical tolerance of the threshold)
    np.testing.assert_allclose(np.asarray(masks), masks_ref.numpy(), atol=2e-2, rtol=1e-2)
    mref = masks_ref.numpy()
    confident = np.abs(mref) > 0.05
    if confident.any():
        agree = np.mean((np.asarray(masks)[confident] > 0) == (mref[confident] > 0))
        assert agree > 0.999, agree


def test_decoder_bf16_consistency(sam_pair, rng):
    """The shipped decoder dtype is bf16 (SamConfig.decoder_dtype): the
    binarized masks and thresholded iou decisions must track the f32 path."""
    import dataclasses

    _, variables, ours = sam_pair
    bf16_sam = Sam(dataclasses.replace(TEST_CFG, decoder_dtype="bfloat16"))
    img = rng.uniform(0, 255, (256, 256, 3)).astype(np.float32)
    pt = np.asarray([[[120.0, 140.0], [0.0, 0.0]]], np.float32)
    lab = np.asarray([[1, -1]], np.int32)

    m32, i32 = ours.apply(
        variables, jnp.asarray(img), (256, 256), jnp.asarray(pt), jnp.asarray(lab)
    )
    m16, i16 = bf16_sam.apply(
        variables, jnp.asarray(img), (256, 256), jnp.asarray(pt), jnp.asarray(lab)
    )
    np.testing.assert_allclose(np.asarray(i16), np.asarray(i32), atol=3e-2)
    m32 = np.asarray(m32)
    # logits close overall; binarization agreement on the confident subset
    # (random weights keep most logits near 0, so pick the top decile)
    np.testing.assert_allclose(np.asarray(m16), m32, atol=3e-2, rtol=5e-2)
    thr = np.quantile(np.abs(m32), 0.9)
    confident = np.abs(m32) > max(float(thr), 1e-4)
    assert confident.any()
    agree = np.mean((np.asarray(m16)[confident] > 0) == (m32[confident] > 0))
    assert agree > 0.99, agree
