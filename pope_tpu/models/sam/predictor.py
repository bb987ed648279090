"""SamPredictor equivalent: cache an image embedding, then prompt repeatedly.

Reference behavior: segment_anything/predictor.py — set_image/set_torch_image
(:35-91 resize longest side + preprocess + encoder, cached), predict /
predict_torch (:170-245 prompt-batched decoding + postprocess to original
frame), reset_image (:260-271). Functional: the embedding is just an array
returned to the caller; this class only adds the reference's convenience
surface on top of the jitted pieces.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pope_tpu.models.sam.sam import Sam, apply_coords, postprocess_masks, resize_longest_side


class SamPredictor:
    def __init__(self, sam: Sam, variables, rect_encode: bool = False):
        """rect_encode: pad non-square images only to patch multiples (25%
        fewer encoder tokens at VGA; see AMGConfig.rect_encode — default off
        here to keep the interactive surface reference-exact)."""
        self.sam = sam
        self.variables = variables
        self.rect_encode = rect_encode
        self._encode = jax.jit(
            lambda v, img, hw, frame: sam.apply(
                v, sam.apply(v, img, hw, frame, method=sam.preprocess),
                method=sam.encode_image,
            ),
            static_argnames=("hw", "frame"),
        )
        self._decode = jax.jit(
            lambda v, emb, pts, lbl, multi: sam.apply(
                v, emb, pts, lbl, multimask_output=multi, method=sam.decode
            ),
            static_argnames=("multi",),
        )
        self.reset_image()

    def reset_image(self):
        self.features = None
        self.original_hw: Optional[Tuple[int, int]] = None
        self.input_hw: Optional[Tuple[int, int]] = None

    @property
    def is_image_set(self) -> bool:
        return self.features is not None

    def set_image(self, image_rgb: np.ndarray):
        """(H, W, 3) uint8 RGB -> cached embedding (predictor.py:35-91)."""
        import cv2

        self.original_hw = image_rgb.shape[:2]
        S = self.sam.config.encoder.img_size
        self.input_hw = resize_longest_side(*self.original_hw, S)
        resized = cv2.resize(
            image_rgb, (self.input_hw[1], self.input_hw[0]), interpolation=cv2.INTER_LINEAR
        )
        if self.rect_encode:
            from pope_tpu.models.sam.sam import rect_frame

            frame = rect_frame(self.input_hw, self.sam.config.encoder.patch_size)
        else:
            frame = (S, S)
        self.features = self._encode(
            self.variables, jnp.asarray(resized), self.input_hw, frame
        )
        return self.features

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Prompt with points (N, 2)/(N,) labels and/or a box (4,) in
        ORIGINAL image coords; returns (masks (K, H, W), iou (K,),
        low_res (K, 256, 256)) like predictor.py:93-168."""
        assert self.is_image_set, "call set_image first"
        pts = []
        lbls = []
        if point_coords is not None:
            pts.append(np.asarray(point_coords, np.float32))
            lbls.append(np.asarray(point_labels, np.int32))
        if box is not None:
            b = np.asarray(box, np.float32).reshape(2, 2)
            pts.append(b)
            lbls.append(np.asarray([2, 3], np.int32))
        if point_coords is not None and box is None:
            # pad slot (prompt_encoder.py:81-86)
            pts.append(np.zeros((1, 2), np.float32))
            lbls.append(np.asarray([-1], np.int32))
        coords = np.concatenate(pts, 0)[None]
        labels = np.concatenate(lbls, 0)[None]
        coords = np.asarray(apply_coords(jnp.asarray(coords), self.original_hw, self.sam.config.encoder.img_size))

        low_res, iou = self._decode(
            self.variables, self.features, jnp.asarray(coords), jnp.asarray(labels), multimask_output
        )
        masks = postprocess_masks(low_res, self.input_hw, self.original_hw)
        masks = np.asarray(masks[0])
        if not return_logits:
            masks = masks > 0.0
        return masks, np.asarray(iou[0]), np.asarray(low_res[0])

    def predict_batched(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        boxes: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """The reference's `predict_torch` surface (predictor.py:170-245):
        a BATCH of prompt sets against the cached embedding in one decode
        dispatch — boxes (B, 4) and/or per-set points (B, N, 2) with labels
        (B, N), ORIGINAL image coords. Returns (masks (B, K, H, W),
        iou (B, K), low_res (B, K, 256, 256)); K = 3 if multimask_output
        else 1. Boxes embed as their two corner points with labels 2/3
        (prompt_encoder.py:155-159); point-only batches get the reference's
        single pad slot."""
        assert self.is_image_set, "call set_image first"
        parts, lparts = [], []
        if point_coords is not None:
            if point_labels is None:
                raise ValueError(
                    "point_labels is required when point_coords is given "
                    "(reference predict_torch contract, predictor.py:170-245)"
                )
            pc = np.asarray(point_coords, np.float32)
            assert pc.ndim == 3, "predict_batched expects (B, N, 2) points"
            parts.append(pc)
            lparts.append(np.asarray(point_labels, np.int32).reshape(pc.shape[:2]))
        if boxes is not None:
            b = np.asarray(boxes, np.float32).reshape(-1, 2, 2)
            parts.append(b)
            lparts.append(np.broadcast_to(np.asarray([2, 3], np.int32), (len(b), 2)))
        assert parts, "need points and/or boxes"
        if len(parts) == 2 and len(parts[0]) != len(parts[1]):
            raise ValueError("point and box batch sizes differ")
        if boxes is None:
            B = len(parts[0])
            parts.append(np.zeros((B, 1, 2), np.float32))
            lparts.append(np.full((B, 1), -1, np.int32))
        coords = np.concatenate(parts, axis=1)
        labels = np.concatenate(lparts, axis=1)
        coords = np.asarray(
            apply_coords(jnp.asarray(coords), self.original_hw, self.sam.config.encoder.img_size)
        )
        low_res, iou = self._decode(
            self.variables, self.features, jnp.asarray(coords), jnp.asarray(labels), multimask_output
        )
        masks = postprocess_masks(low_res, self.input_hw, self.original_hw)
        masks = np.asarray(masks)
        if not return_logits:
            masks = masks > 0.0
        return masks, np.asarray(iou), np.asarray(low_res)
