"""Full-scale SAM encoder parity: the TRUE vit_h per-layer configuration
(embed 1280, 16 heads, window 14, 64x64 token grid — build_sam.py:13-19)
against the reference torch encoder with converted random weights.

Round-2 verdict item #1a: the shrunken-config parity tests never exercised
`get_rel_pos` at real sizes (rel-pos tables of 27 entries for the windowed
blocks, 127 for the 4096-token global blocks,
segment_anything/modeling/image_encoder.py:292-360), nor the 64->70
window-padding path at window 14. This runs one windowed + one global block
at full scale (depth 2 keeps CPU runtime in seconds; every other dimension
is the real vit_h value), through the full patch-embed -> blocks -> neck
stack.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from pope_tpu.config import SamConfig, SamEncoderConfig
from pope_tpu.models.sam import Sam, convert_torch_sam_state
from tests.torch_ref import load_reference_sam

pytestmark = pytest.mark.slow

H2_CFG = SamConfig(
    encoder=SamEncoderConfig(
        img_size=1024, patch_size=16, embed_dim=1280, depth=2, num_heads=16,
        window_size=14, global_attn_indexes=(1,), out_chans=256,
        dtype="float32", use_flash_attention=False, gelu="erf",
    ),
    prompt_embed_dim=256,
    image_embedding_size=64,
    decoder_num_heads=8,
    decoder_mlp_dim=2048,
    iou_head_hidden_dim=256,
    decoder_dtype="float32",
)


@pytest.fixture(scope="module")
def h2_pair():
    ref, sd = load_reference_sam(seed=11, size="h2")
    variables = convert_torch_sam_state(sd, depth=2)
    ours = Sam(H2_CFG)
    return ref, variables, ours


def test_windowed_block_parity_vith_scale(h2_pair, rng):
    """Block 0 (window 14 over the 64x64 grid: pad to 70x70, 25 windows of
    196 tokens, 27-entry rel-pos tables) in isolation."""
    ref, variables, ours = h2_pair
    x = rng.standard_normal((1, 64, 64, 1280)).astype(np.float32) * 0.5
    with torch.no_grad():
        out_ref = ref.image_encoder.blocks[0](torch.from_numpy(x))

    from pope_tpu.models.sam.encoder import EncoderBlock

    blk = EncoderBlock(
        dim=1280, num_heads=16, mlp_ratio=4.0, window_size=14,
        use_rel_pos=True, grid=64, dtype=jnp.float32,
    )
    out = blk.apply(
        {"params": variables["params"]["image_encoder"]["block_0"]}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(out), out_ref.numpy(), atol=2e-3, rtol=1e-2
    )


def test_global_block_parity_vith_scale(h2_pair, rng):
    """Block 1 (global attention over all 4096 tokens, 127-entry rel-pos
    tables indexed at q=k=64) in isolation."""
    ref, variables, ours = h2_pair
    x = rng.standard_normal((1, 64, 64, 1280)).astype(np.float32) * 0.5
    with torch.no_grad():
        out_ref = ref.image_encoder.blocks[1](torch.from_numpy(x))

    from pope_tpu.models.sam.encoder import EncoderBlock

    blk = EncoderBlock(
        dim=1280, num_heads=16, mlp_ratio=4.0, window_size=0,
        use_rel_pos=True, grid=64, dtype=jnp.float32,
    )
    out = blk.apply(
        {"params": variables["params"]["image_encoder"]["block_1"]}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(out), out_ref.numpy(), atol=2e-3, rtol=1e-2
    )


def test_encoder_parity_vith_scale(h2_pair, rng):
    """Whole encoder at the true vit_h layer scale: 1024x1024 input ->
    patch embed -> abs pos -> windowed block -> global block -> neck."""
    ref, variables, ours = h2_pair
    img = rng.uniform(-1, 1, (1, 1024, 1024, 3)).astype(np.float32)
    with torch.no_grad():
        emb_ref = ref.image_encoder(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    emb = ours.apply(variables, jnp.asarray(img), method=ours.encode_image)
    np.testing.assert_allclose(
        np.asarray(emb), emb_ref.numpy().transpose(0, 2, 3, 1),
        atol=2e-3, rtol=1e-2,
    )
