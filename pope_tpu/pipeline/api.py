"""Model registry and loading (the pope_model_api.py equivalent).

Reference behavior: pope_model_api.py:109-123 (get_model_info -> SAM ckpt
path per size), :177-185 (matcher construction + checkpoint load with prefix
strip), eval drivers' load_dinov2_model.

Weights load from the reference's torch .pth layouts via the per-model
converters; models fall back to deterministic random init when a checkpoint
is absent (this container ships none — .MISSING_LARGE_BLOBS).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np

from pope_tpu.config import (
    AMGConfig,
    DinoV2Config,
    MatcherConfig,
    PipelineConfig,
    SamConfig,
    SamEncoderConfig,
)
from pope_tpu.models.dinov2 import DinoVisionTransformer, convert_torch_dinov2_state
from pope_tpu.models.matcher import Matcher, convert_torch_matcher_state
from pope_tpu.models.sam import AutomaticMaskGenerator, Sam, convert_torch_sam_state

SAM_CHECKPOINTS = {
    # pope_model_api.py:109-123
    "b": ("weights/sam_vit_b_01ec64.pth", SamEncoderConfig.vit_b),
    "l": ("weights/sam_vit_l_0b3195.pth", SamEncoderConfig.vit_l),
    "h": ("weights/sam_vit_h_4b8939.pth", SamEncoderConfig.vit_h),
}


def _load_torch_state(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


@dataclasses.dataclass
class PopeModels:
    """The loaded model bundle the drivers operate on."""

    sam: Sam
    sam_variables: Any
    dinov2: DinoVisionTransformer
    dinov2_variables: Any
    matcher: Matcher
    matcher_variables: Any
    amg: AutomaticMaskGenerator
    config: PipelineConfig


def load_models(
    config: PipelineConfig = PipelineConfig(),
    sam_checkpoint: Optional[str] = None,
    sam_type: str = "h",
    dinov2_checkpoint: Optional[str] = None,
    matcher_checkpoint: Optional[str] = None,
    seed: int = 0,
    components: tuple = ("sam", "dinov2", "matcher"),
    validate_checkpoints: bool = True,
) -> PopeModels:
    """Build SAM + DINOv2 + matcher, loading torch checkpoints when given.

    Mirrors the driver bootstrap (eval_linemod_json.py:3-11 +
    pope_model_api.py:177-185) in one call.

    components: which towers to actually build — skipping one leaves its
    slots None in the returned bundle (without a checkpoint, SAM's random
    init traces the full ViT-H forward; single-model consumers like
    `cli export` shouldn't pay that for towers they never touch).

    validate_checkpoints: check each torch file's key/shape inventory
    against the released-checkpoint manifest before converting, so a
    mismatched file fails loudly instead of silently producing garbage
    (utils/state_manifest.py). Only applies when the model config matches
    the released variant; pass False for custom-architecture checkpoints.
    """
    from pope_tpu.utils.state_manifest import check_state_dict

    sam = sam_vars = amg = None
    if "sam" in components:
        _, enc_factory = SAM_CHECKPOINTS[sam_type]
        sam_cfg = dataclasses.replace(config.sam, encoder=enc_factory())
        sam = Sam(sam_cfg)
        if sam_checkpoint:
            sd = _load_torch_state(sam_checkpoint)
            if validate_checkpoints:
                check_state_dict(sd, f"sam_vit_{sam_type}")
            sam_vars = convert_torch_sam_state(sd, depth=sam_cfg.encoder.depth)
        else:
            rng = jax.random.PRNGKey(seed)
            import jax.numpy as jnp

            sam_vars = jax.jit(
                lambda r: sam.init(
                    r, jnp.zeros((sam_cfg.encoder.img_size, sam_cfg.encoder.img_size, 3)),
                    (sam_cfg.encoder.img_size, sam_cfg.encoder.img_size),
                    jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32),
                )
            )(rng)
        # bf16 storage for the bf16-computing encoder: bit-identical (flax
        # casts f32->bf16 before every matmul anyway) and halves the ~2.5 GB
        # of f32 weight reads the AMG dispatch otherwise pays (buffer_audit).
        from pope_tpu.utils.bf16_storage import cast_sam_storage

        sam_vars = cast_sam_storage(sam_vars, sam_cfg.encoder)
        amg = AutomaticMaskGenerator(sam, sam_vars, config.amg, sam_cfg)

    dinov2 = dinov2_vars = None
    if "dinov2" in components:
        dinov2 = DinoVisionTransformer(config.dinov2)
        if dinov2_checkpoint:
            sd = _load_torch_state(dinov2_checkpoint)
            # validate only the released flat-key vits14 layout; SSL-style
            # student/teacher- or backbone.-wrapped checkpoints go straight
            # to normalize_dinov2_keys
            flat = not any(
                k in sd and isinstance(sd[k], dict) for k in ("student", "teacher")
            ) and not any(k.startswith(("backbone.", "module.")) for k in sd)
            if validate_checkpoints and flat and config.dinov2.depth == 12 and config.dinov2.embed_dim == 384:
                check_state_dict(sd, "dinov2_vits14", extra_optional=("mask_token",))
            dinov2_vars = convert_torch_dinov2_state(sd, depth=config.dinov2.depth)
        else:
            import jax.numpy as jnp

            dinov2_vars = jax.jit(dinov2.init)(jax.random.PRNGKey(seed + 1), jnp.zeros((1, 196, 196, 3)))

    matcher = matcher_vars = None
    if "matcher" in components:
        matcher = Matcher(config.matcher)
        if matcher_checkpoint:
            sd = _load_torch_state(matcher_checkpoint)
            if validate_checkpoints and config.matcher == MatcherConfig():
                check_state_dict(sd, "matcher")
            matcher_vars = convert_torch_matcher_state(sd)
        else:
            import jax.numpy as jnp

            matcher_vars = jax.jit(matcher.init)(
                jax.random.PRNGKey(seed + 2), jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1))
            )

    return PopeModels(
        sam=sam,
        sam_variables=sam_vars,
        dinov2=dinov2,
        dinov2_variables=dinov2_vars,
        matcher=matcher,
        matcher_variables=matcher_vars,
        amg=amg,
        config=config,
    )
