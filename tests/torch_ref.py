"""Harness to import the *reference* PyTorch matcher for numerical parity
tests (test-time oracle only — no reference code is vendored).

The reference needs `yacs` and `kornia`, which aren't installed; tiny stubs
implementing just the surface the matcher touches are injected first.
"""

import sys
import types

import numpy as np
import torch


def _install_stubs():
    if "yacs" not in sys.modules:
        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")

        class CfgNode(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        yacs_config.CfgNode = CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config

    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        geometry = types.ModuleType("kornia.geometry")
        subpix = types.ModuleType("kornia.geometry.subpix")
        dsnt = types.ModuleType("kornia.geometry.subpix.dsnt")
        utils_mod = types.ModuleType("kornia.utils")
        grid_mod = types.ModuleType("kornia.utils.grid")

        def create_meshgrid(height, width, normalized_coordinates=True, device=None, dtype=None):
            if normalized_coordinates:
                xs = torch.linspace(-1.0, 1.0, width, device=device)
                ys = torch.linspace(-1.0, 1.0, height, device=device)
            else:
                xs = torch.arange(width, device=device).float()
                ys = torch.arange(height, device=device).float()
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            return torch.stack([gx, gy], dim=-1)[None]  # (1, H, W, 2) xy

        def spatial_expectation2d(heatmap, normalized_coordinates=True):
            # heatmap: (B, N, H, W), already a probability distribution
            B, N, H, W = heatmap.shape
            grid = create_meshgrid(H, W, normalized_coordinates, heatmap.device)
            grid = grid.reshape(1, 1, H * W, 2)
            hm = heatmap.reshape(B, N, H * W, 1)
            return torch.sum(hm * grid, dim=2)  # (B, N, 2)

        dsnt.spatial_expectation2d = spatial_expectation2d
        grid_mod.create_meshgrid = create_meshgrid
        subpix.dsnt = dsnt
        geometry.subpix = subpix
        kornia.geometry = geometry
        kornia.utils = utils_mod
        utils_mod.grid = grid_mod
        sys.modules["kornia"] = kornia
        sys.modules["kornia.geometry"] = geometry
        sys.modules["kornia.geometry.subpix"] = subpix
        sys.modules["kornia.geometry.subpix.dsnt"] = dsnt
        sys.modules["kornia.utils"] = utils_mod
        sys.modules["kornia.utils.grid"] = grid_mod


def load_reference_matcher(seed=0):
    """Build the reference torch Matcher with its default config and
    deterministic random weights. Returns (matcher.eval(), state_dict)."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    torch.manual_seed(seed)
    from src.matcher import Matcher, default_cfg  # noqa: E402

    m = Matcher(config=default_cfg)
    m.eval()
    # randomize BN running stats so conversion bugs in stats are caught
    g = torch.Generator().manual_seed(seed + 1)
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean = torch.randn(mod.num_features, generator=g) * 0.1
            mod.running_var = torch.rand(mod.num_features, generator=g) + 0.5
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return m, sd


def _install_torchvision_stub():
    """The reference SAM package imports torchvision only for batched_nms
    (automatic_mask_generator.py); stub it so the modeling stack imports."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")

    def batched_nms(boxes, scores, idxs, iou_threshold):
        # greedy NMS, descending score (matches torchvision semantics)
        keep = []
        order = torch.argsort(scores, descending=True)
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        for i in order:
            if suppressed[i]:
                continue
            keep.append(i.item())
            bi = boxes[i]
            for j in order:
                if suppressed[j] or j == i or idxs[i] != idxs[j]:
                    continue
                xA = max(bi[0], boxes[j][0]); yA = max(bi[1], boxes[j][1])
                xB = min(bi[2], boxes[j][2]); yB = min(bi[3], boxes[j][3])
                inter = max(0.0, float(xB - xA)) * max(0.0, float(yB - yA))
                areaA = float((bi[2] - bi[0]) * (bi[3] - bi[1]))
                areaB = float((boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1]))
                if inter / max(areaA + areaB - inter, 1e-9) > iou_threshold:
                    suppressed[j] = True
        return torch.tensor(keep, dtype=torch.long)

    ops.batched_nms = batched_nms
    ops.__path__ = []
    ops_boxes = types.ModuleType("torchvision.ops.boxes")
    ops_boxes.batched_nms = batched_nms
    ops_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    ops.boxes = ops_boxes
    tv.ops = ops
    transforms = types.ModuleType("torchvision.transforms")
    transforms.__path__ = []  # mark as package
    tf_functional = types.ModuleType("torchvision.transforms.functional")

    def _resize(img, size, **kw):
        try:
            from PIL import Image

            if isinstance(img, Image.Image):
                h, w = (size, size) if isinstance(size, int) else size
                return img.resize((w, h), Image.BILINEAR)
        except ImportError:
            pass
        return torch.nn.functional.interpolate(
            img[None] if img.ndim == 3 else img, size=size, mode="bilinear",
            align_corners=False, antialias=True,
        ).squeeze(0)

    def _to_pil_image(x):
        from PIL import Image

        if isinstance(x, torch.Tensor):
            x = x.numpy()
        return Image.fromarray(np.asarray(x))

    tf_functional.resize = _resize
    tf_functional.to_pil_image = _to_pil_image
    transforms.functional = tf_functional
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = ops_boxes
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tf_functional


def _install_minkowski_stub():
    """pose/convnextv2/utils.py imports SparseTensor at module level; the
    dense ConvNeXtV2 path never touches it."""
    if "MinkowskiEngine" in sys.modules:
        return
    me = types.ModuleType("MinkowskiEngine")

    class _Unavailable:
        def __init__(self, *a, **kw):
            raise RuntimeError("MinkowskiEngine stub: sparse path unavailable")

    for name in (
        "SparseTensor", "MinkowskiConvolution",
        "MinkowskiDepthwiseConvolution", "MinkowskiLinear",
    ):
        setattr(me, name, _Unavailable)
    sys.modules["MinkowskiEngine"] = me


def _install_timm_stub():
    """pose/convnextv2 imports only trunc_normal_ and DropPath from timm."""
    _install_minkowski_stub()
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x  # eval-time identity

    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def load_reference_convnextv2(seed=0, depths=(2, 2, 4, 2), dims=(16, 32, 48, 64),
                              num_classes=10):
    """Reference torch ConvNeXtV2 (pose/convnextv2/convnextv2.py) with
    deterministic random weights as a converter-parity oracle."""
    _install_timm_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    torch.manual_seed(seed)
    from pose.convnextv2.convnextv2 import ConvNeXtV2

    m = ConvNeXtV2(depths=list(depths), dims=list(dims), num_classes=num_classes)
    m.eval()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return m, sd


def load_reference_sam(seed=0, size="test"):
    """Build a small reference SAM (random weights) as a parity oracle.

    size='test': a shrunken ViT (embed 64, 4 blocks, window 4, img 256) so
    CPU parity tests stay fast; 'b'/'l'/'h' use the real configs.
    """
    _install_torchvision_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    torch.manual_seed(seed)
    from functools import partial
    from segment_anything.segment_anything.modeling import (
        ImageEncoderViT, MaskDecoder, PromptEncoder, Sam, TwoWayTransformer,
    )

    if size == "test":
        img_size, patch, embed, depth, heads, win, glob = 256, 16, 64, 4, 2, 4, (1, 3)
    elif size == "b":
        img_size, patch, embed, depth, heads, win, glob = 1024, 16, 768, 12, 12, 14, (2, 5, 8, 11)
    elif size == "h2":
        # the TRUE vit_h per-layer config (embed 1280, 16 heads, window 14,
        # 64x64 grid, build_sam.py:13-19) at depth 2 (one windowed + one
        # global block) so full-scale rel-pos/window-padding parity runs on
        # CPU in seconds instead of minutes
        img_size, patch, embed, depth, heads, win, glob = 1024, 16, 1280, 2, 16, 14, (1,)
    else:
        raise NotImplementedError(size)
    prompt_embed_dim = 64 if size == "test" else 256
    emb_size = img_size // patch

    sam = Sam(
        image_encoder=ImageEncoderViT(
            depth=depth, embed_dim=embed, img_size=img_size, mlp_ratio=4,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6), num_heads=heads,
            patch_size=patch, qkv_bias=True, use_rel_pos=True,
            global_attn_indexes=glob, window_size=win, out_chans=prompt_embed_dim,
        ),
        prompt_encoder=PromptEncoder(
            embed_dim=prompt_embed_dim, image_embedding_size=(emb_size, emb_size),
            input_image_size=(img_size, img_size), mask_in_chans=16,
        ),
        mask_decoder=MaskDecoder(
            num_multimask_outputs=3,
            transformer=TwoWayTransformer(
                depth=2, embedding_dim=prompt_embed_dim, mlp_dim=256 if size == "test" else 2048,
                num_heads=2 if size == "test" else 8,
            ),
            transformer_dim=prompt_embed_dim,
            iou_head_depth=3, iou_head_hidden_dim=64 if size == "test" else 256,
        ),
        pixel_mean=[123.675, 116.28, 103.53],
        pixel_std=[58.395, 57.12, 57.375],
    )
    sam.eval()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for param in sam.parameters():
            param.copy_(torch.randn(param.shape, generator=g) * 0.04)
    sd = {k: v.detach().numpy() for k, v in sam.state_dict().items()}
    return sam, sd
