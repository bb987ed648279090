"""SAM prompt encoder (flax, functional, static shapes).

Behavioral spec: segment_anything/modeling/prompt_encoder.py —
`PromptEncoder` :16-169 (4 point-type embeddings + not-a-point embedding,
mask downscaling conv stack, no-mask embedding), `PositionEmbeddingRandom`
:171-217 (random Fourier features of [0,1]-normalized coords).

Label convention (predictor/AMG): 1 = foreground point, 0 = background
point, -1 = padding slot, 2/3 = box corners. Point coords are shifted by
+0.5 to pixel centers (:82,:99).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


def random_position_embedding(gaussian_matrix, coords01):
    """Fourier-feature PE of [0,1]^2 coords: (..., 2) -> (..., 2*feats)
    (prompt_encoder.py:186-194)."""
    coords = 2.0 * coords01 - 1.0
    proj = (2.0 * jnp.pi) * (coords @ gaussian_matrix)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def dense_grid_pe(gaussian_matrix, hw: Tuple[int, int], norm_hw: Optional[Tuple[int, int]] = None):
    """(H, W, C) dense PE over pixel-center grid (prompt_encoder.py:196-207).

    norm_hw (default hw) sets the normalization grid: a RECT (gh, gw) grid
    normalized by the full square grid yields the exact top-left slice of the
    square dense PE, keeping rect-encode embeddings consistent with point
    coords normalized by the square input frame."""
    h, w = hw
    nh, nw = hw if norm_hw is None else norm_hw
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / nh
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / nw
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2)
    return random_position_embedding(gaussian_matrix, grid)


class PromptEncoder(nn.Module):
    """Returns (sparse_embeddings (B, N, C), dense_embeddings (B, h, w, C)).

    points: (B, N, 2) pixel coords with labels (B, N) in {-1, 0, 1, 2, 3};
    slots labeled -1 are padding. Boxes are passed as two corner points with
    labels 2, 3 (a TPU-friendly flattening of the reference's separate
    points/boxes arguments). masks: optional (B, 4h, 4w, 1) low-res masks.
    """

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16

    def setup(self):
        self.gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2)
        )
        # 0: negative point, 1: positive point, 2/3: box corners
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.no_mask = self.param(
            "no_mask", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.mask_conv1 = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2), name="mask_conv1")
        self.mask_conv2 = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2), name="mask_conv2")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), name="mask_conv3")
        self.mask_ln1 = nn.LayerNorm(epsilon=1e-6, name="mask_ln1")
        self.mask_ln2 = nn.LayerNorm(epsilon=1e-6, name="mask_ln2")

    def get_dense_pe(self, hw: Optional[Tuple[int, int]] = None):
        """(h, w, C); a rect `hw` sub-grid slices the square PE exactly."""
        return dense_grid_pe(
            self.gaussian, hw or self.image_embedding_size, self.image_embedding_size
        )

    def __call__(self, points, labels, masks=None, embed_hw: Optional[Tuple[int, int]] = None):
        H, W = self.input_image_size
        coords = (points + 0.5) / jnp.asarray([W, H], jnp.float32)
        pe = random_position_embedding(self.gaussian, coords)  # (B, N, C)
        labels = labels[..., None]
        # label -1: PE replaced by the not-a-point embedding (ref zeroes the
        # PE then adds not_a_point_embed, prompt_encoder.py:88-90)
        emb = jnp.where(labels == -1, self.not_a_point, pe)
        emb = emb + jnp.where(labels == 0, self.point_embeddings[0], 0.0)
        emb = emb + jnp.where(labels == 1, self.point_embeddings[1], 0.0)
        emb = emb + jnp.where(labels == 2, self.point_embeddings[2], 0.0)
        emb = emb + jnp.where(labels == 3, self.point_embeddings[3], 0.0)
        sparse = emb

        h, w = embed_hw or self.image_embedding_size
        if masks is not None:
            m = self.mask_conv1(masks)
            m = self.mask_ln1(m)
            m = nn.gelu(m, approximate=False)
            m = self.mask_conv2(m)
            m = self.mask_ln2(m)
            m = nn.gelu(m, approximate=False)
            dense = self.mask_conv3(m)
        else:
            B = points.shape[0]
            # B=1, not B: every prompt shares the no-mask embedding, and the
            # size-1 batch dim is what lets MaskDecoder/TwoWayTransformer
            # hoist block-0's image-side projections out of the prompt axis
            dense = jnp.broadcast_to(self.no_mask, (1, h, w, self.embed_dim))
        return sparse, dense
