"""Model export for serving.

Reference behavior: segment_anything/scripts/export_onnx_model.py +
utils/onnx.py:17 (SamOnnxModel: the prompt-encoder + mask-decoder head
packaged for the browser demo, taking cached image embeddings + point
prompts). TPU-native: jax.export serializes the same decode head as a
StableHLO artifact runnable from any jax/XLA runtime (the ONNX surface's
jax-world equivalent); `export_sam_decoder` mirrors SamOnnxModel's
signature (embeddings, point_coords, point_labels -> masks, iou).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def export_sam_decoder(sam, variables, num_points: int = 8, path: str | None = None):
    """Serialize the prompt->mask decode head with fixed prompt capacity.

    Returns the serialized bytes (and writes them to `path` if given).
    Reload with `jax.export.deserialize(blob).call(...)`.
    """
    from jax import export as jexport

    emb_size = sam.config.image_embedding_size
    C = sam.config.prompt_embed_dim

    def decode(embeddings, point_coords, point_labels):
        return sam.apply(
            variables, embeddings, point_coords, point_labels,
            multimask_output=True, method=sam.decode,
        )

    args = (
        jax.ShapeDtypeStruct((1, emb_size, emb_size, C), jnp.float32),
        jax.ShapeDtypeStruct((1, num_points, 2), jnp.float32),
        jax.ShapeDtypeStruct((1, num_points), jnp.int32),
    )
    exported = jexport.export(jax.jit(decode))(*args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_blob):
    from jax import export as jexport

    blob = path_or_blob
    if isinstance(path_or_blob, str):
        with open(path_or_blob, "rb") as f:
            blob = f.read()
    return jexport.deserialize(blob)
