"""bf16 storage for weights that are consumed at bf16 compute precision.

The per-buffer HLO audit (scripts/buffer_audit.py) shows the AMG program
prefetches several GB of float32 encoder weights per dispatch, every one of
which flax immediately casts to bfloat16 inside the Dense/Conv promote step
(`SamEncoderConfig.dtype = 'bfloat16'`). Casting the STORED tree to bf16 is
bit-identical for those leaves — f32->bf16 round-to-nearest happens either at
load time or at compute time, same value — and halves the weight-read traffic
of every dispatch.

Only leaves that the module consumes at bf16 are cast. Params consumed at
float32 (the `nn.LayerNorm(dtype=jnp.float32)` scales/biases and the
`LayerNorm2d` neck norms — see models/sam/encoder.py:133,181,232,234) stay
f32: casting those WOULD change values. `tests/test_bf16_storage.py` pins the
bit-identity claim by comparing full encoder outputs f32-stored vs
bf16-stored.

Behavioral spec: storage-side optimization only; the computation matches
segment_anything/modeling/image_encoder.py exactly as before.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# param subtree names (any path component) whose leaves are consumed at f32
# inside the SAM image encoder: nn.LayerNorm(dtype=f32) blocks and the
# LayerNorm2d neck norms.
_SAM_ENCODER_KEEP_F32 = ("norm1", "norm2", "neck_ln1", "neck_ln2")


def _cast_tree(tree: Any, keep_f32: tuple) -> Any:
    def cast(path, leaf):
        names = {getattr(p, "key", None) for p in path}
        if names & set(keep_f32):
            return leaf
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
            return leaf.astype(jnp.bfloat16)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, tree)


def cast_sam_storage(variables: Any, encoder_cfg) -> Any:
    """Cast the image-encoder weights of a SAM variable tree to bf16 storage
    when the encoder computes in bf16 (and is not quantized — the int8 path
    quantizes from the stored f32 values, so its storage is left alone).

    prompt_encoder / mask_decoder are left untouched: together they are <1%
    of SAM's weight bytes and contain params consumed at promoted-f32
    precision (mask_ln*, token embeddings)."""
    if jnp.dtype(encoder_cfg.dtype) != jnp.bfloat16 or encoder_cfg.quantize != "none":
        return variables
    params = dict(variables["params"])
    if "image_encoder" in params:
        params["image_encoder"] = _cast_tree(
            params["image_encoder"], _SAM_ENCODER_KEEP_F32
        )
    out = dict(variables)
    out["params"] = params
    return out
