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


def export_sam_prompt_head(
    sam,
    variables,
    orig_hw: Tuple[int, int],
    num_points: int = 8,
    return_single_mask: bool = False,
    use_stability_score: bool = False,
    path: str | None = None,
):
    """The FULL SamOnnxModel surface (segment_anything/utils/onnx.py:17-144
    + scripts/export_onnx_model.py), serialized as StableHLO:

      (image_embeddings (1, E, E, C), point_coords (1, P, 2) in the
       1024-frame, point_labels (1, P), mask_input (1, 4E, 4E, 1),
       has_mask_input (1,)[, click_count (1,) — single-mask variant only])
      -> (upscaled_masks (1, K, H0, W0) at `orig_hw`,
          scores (1, K), low_res_masks (1, K, 256, 256))

    Deltas vs the reference, by design:
    - `orig_im_size` is a static export argument rather than a runtime
      tensor (XLA compiles static shapes; export one artifact per serving
      resolution — the reference exports one ONNX per deployment anyway);
    - `return_single_mask=True` implements the reference's runtime
      (num_points - 2.5) score-reweight over ALL FOUR mask tokens EXACTLY
      (onnx.py:92-107; it is branch-free arithmetic, so it exports
      unchanged) — but since the prompt axis here is a fixed capacity P
      padded with label -1 no-op slots rather than a dynamic ONNX axis, the
      TRUE point count (clicks + the one (0,0)/-1 pad point, as the browser
      client counts it in onnxModelAPI.tsx) arrives as the runtime
      `click_count` input instead of being read off the tensor shape.
    """
    from jax import export as jexport

    from pope_tpu.models.sam.sam import postprocess_masks, resize_longest_side

    emb_size = sam.config.image_embedding_size
    C = sam.config.prompt_embed_dim
    S = sam.config.encoder.img_size
    low = 4 * emb_size
    input_hw = resize_longest_side(orig_hw[0], orig_hw[1], S)

    def run(embeddings, point_coords, point_labels, mask_input, has_mask_input,
            click_count=None):
        def heads(mdl):
            sparse, dense_m = mdl.prompt_encoder(point_coords, point_labels, mask_input)
            _, dense_nm = mdl.prompt_encoder(point_coords, point_labels, None)
            # has_mask blending (onnx.py:69-75): branch-free select between
            # the downscaled mask embedding and the no-mask embedding
            w = has_mask_input.reshape(-1, 1, 1, 1)
            dense = w * dense_m + (1.0 - w) * dense_nm
            # the reference head decodes ALL 4 tokens (onnx.py:120-125 calls
            # predict_masks, never the multimask slice); return_single_mask
            # then narrows via select_masks, else all 4 ship to the client
            return mdl.mask_decoder(
                embeddings, mdl.prompt_encoder.get_dense_pe(), sparse, dense,
                multimask_output=True, return_all_tokens=True,
            )

        masks, scores = sam.apply(variables, method=heads)
        if use_stability_score:
            from pope_tpu.ops.masks import calculate_stability_score

            scores = calculate_stability_score(masks, 0.0, 1.0)
        if return_single_mask:
            # select_masks (onnx.py:92-107): token 0 gets +-1000·(n - 2.5)
            reweight = jnp.array([[1000.0, 0.0, 0.0, 0.0]], scores.dtype)
            score = scores + (click_count.reshape(-1, 1) - 2.5) * reweight
            best = jnp.argmax(score, axis=1)
            masks = jnp.take_along_axis(masks, best[:, None, None, None], axis=1)
            scores = jnp.take_along_axis(scores, best[:, None], axis=1)
        upscaled = postprocess_masks(masks, input_hw, orig_hw)
        return upscaled, scores, masks

    args = (
        jax.ShapeDtypeStruct((1, emb_size, emb_size, C), jnp.float32),
        jax.ShapeDtypeStruct((1, num_points, 2), jnp.float32),
        jax.ShapeDtypeStruct((1, num_points), jnp.int32),
        jax.ShapeDtypeStruct((1, low, low, 1), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.float32),
    )
    if return_single_mask:
        args = args + (jax.ShapeDtypeStruct((1,), jnp.float32),)
    exported = jexport.export(jax.jit(run))(*args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_matcher(matcher, variables, hw0: Tuple[int, int], hw1: Tuple[int, int], path: str | None = None):
    """Serialize the full coarse-to-fine matcher at fixed image shapes:
    (image0 (1, H0, W0, 1), image1 (1, H1, W1, 1)) -> (mkpts0, mkpts1,
    mconf, valid). No reference analogue exists (its export surface stops at
    SAM); provided so serving needs no Python model code for matching."""
    from jax import export as jexport

    def run(image0, image1):
        res = matcher.apply(variables, image0, image1)
        return res.mkpts0, res.mkpts1, res.mconf, res.valid

    args = (
        jax.ShapeDtypeStruct((1, *hw0, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, *hw1, 1), jnp.float32),
    )
    blob = jexport.export(jax.jit(run))(*args).serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_dinov2(dinov2, variables, img_size: int = 196, path: str | None = None):
    """Serialize the retrieval tower: (1, S, S, 3) normalized image ->
    (1, D) cls token (dinov2_utils.get_cls_token_torch semantics)."""
    from jax import export as jexport

    def run(image):
        return dinov2.apply(variables, image)["x_norm_clstoken"]

    args = (jax.ShapeDtypeStruct((1, img_size, img_size, 3), jnp.float32),)
    blob = jexport.export(jax.jit(run))(*args).serialize()
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
