"""LPIPS perceptual distance (Zhang et al., CVPR 2018) — TPU-native.

Behavioral spec: the reference's novel-view app reports an `lpips` metric
imported from its external gnt_utils package (src/novel_view_render.py:13,
alongside img2psnr/ssim) — the standard LPIPS formulation: AlexNet
conv-stage features, channel-unit-normalized, squared difference, the
official calibrated non-negative 1x1 "lin" heads, spatial mean, summed over
the five taps. That import is broken/external in the reference itself; here
the architecture is implemented natively (one jitted NHWC program — conv
stages map onto the MXU) and the released weights load through strict
key/shape-validated converters, following the same fail-loudly discipline as
utils/state_manifest.py. No pretrained weights ship in this container, so
`lpips_from_torch_files` is the gate: without the two released files
(torchvision `alexnet-*.pth`, lpips package `alex.pth`) the NVS driver
simply skips the metric, as documented in image_metrics.py.

Inputs are RGB in [0, 1] (the NVS driver's native range); the module applies
the official [-1, 1] mapping + per-channel shift/scale internally (the
`normalize=True` convention of the released implementation).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Official ScalingLayer constants (lpips package): applied to [-1, 1] inputs.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet `features` stack. LPIPS taps the output of each ReLU;
# MaxPool(3, 2) sits before conv2 and conv3 only (the trailing pool after
# relu5 is outside the last LPIPS slice and never runs here).
# name -> (in_ch, out_ch, kernel, stride, pad, pool_before)
_STAGES = (
    ("conv1", 3, 64, 11, 4, 2, False),
    ("conv2", 64, 192, 5, 1, 2, True),
    ("conv3", 192, 384, 3, 1, 1, True),
    ("conv4", 384, 256, 3, 1, 1, False),
    ("conv5", 256, 256, 3, 1, 1, False),
)
_TAP_CHANNELS = (64, 192, 384, 256, 256)

# Raw released-file key -> shape inventories (state_manifest.py discipline:
# pin the exact inventory, name every deviation before conversion runs).
ALEXNET_MANIFEST: Dict[str, Tuple[int, ...]] = {}
for _i, (_name, _cin, _cout, _k, _s, _p, _pool) in zip((0, 3, 6, 8, 10), _STAGES):
    ALEXNET_MANIFEST[f"features.{_i}.weight"] = (_cout, _cin, _k, _k)
    ALEXNET_MANIFEST[f"features.{_i}.bias"] = (_cout,)
# torchvision's full AlexNet file also carries the classifier head; it is
# legitimately present and ignored (LPIPS uses only `features`).
_ALEXNET_OPTIONAL_PREFIX = "classifier."

LPIPS_LINS_MANIFEST: Dict[str, Tuple[int, ...]] = {
    f"lin{i}.model.1.weight": (1, c, 1, 1) for i, c in enumerate(_TAP_CHANNELS)
}


class LpipsStateMismatch(RuntimeError):
    pass


def _check(sd: Mapping, manifest: Mapping, label: str, optional_prefix: str = "") -> None:
    problems = []
    for k, shape in manifest.items():
        if k not in sd:
            problems.append(f"missing key: {k}")
        elif tuple(sd[k].shape) != tuple(shape):
            problems.append(f"shape mismatch: {k} {tuple(sd[k].shape)} != {tuple(shape)}")
    for k in sd:
        if k not in manifest and not (optional_prefix and k.startswith(optional_prefix)):
            problems.append(f"unknown key: {k}")
    if problems:
        raise LpipsStateMismatch(
            f"{label}: {len(problems)} problem(s):\n  " + "\n  ".join(problems[:12])
        )


def convert_alexnet_features(sd: Mapping) -> Dict[str, Dict[str, np.ndarray]]:
    """torchvision AlexNet state dict -> NHWC conv params.

    Torch conv weights are (out, in, kh, kw); lax.conv_general_dilated with
    dimension_numbers ('NHWC','HWIO','NHWC') wants (kh, kw, in, out).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    _check(sd, ALEXNET_MANIFEST, "alexnet features", _ALEXNET_OPTIONAL_PREFIX)
    params = {}
    for i, (name, *_rest) in zip((0, 3, 6, 8, 10), _STAGES):
        params[name] = {
            "kernel": sd[f"features.{i}.weight"].transpose(2, 3, 1, 0).astype(np.float32),
            "bias": sd[f"features.{i}.bias"].astype(np.float32),
        }
    return params


def convert_lpips_lins(sd: Mapping) -> Dict[str, np.ndarray]:
    """lpips-package `alex.pth` (lin heads only) -> per-tap weight vectors."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    _check(sd, LPIPS_LINS_MANIFEST, "lpips lin heads")
    return {
        f"lin{i}": sd[f"lin{i}.model.1.weight"].reshape(-1).astype(np.float32)
        for i in range(len(_TAP_CHANNELS))
    }


def init_random_params(seed: int = 0) -> Dict:
    """Random-weight tree with the released shapes (tests / shape checks
    only — LPIPS is meaningless without the calibrated weights)."""
    rng = np.random.default_rng(seed)
    feats = {
        name: {
            "kernel": rng.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32),
            "bias": rng.normal(0, 0.05, (cout,)).astype(np.float32),
        }
        for (name, cin, cout, k, _s, _p, _pool) in _STAGES
    }
    lins = {
        f"lin{i}": np.abs(rng.normal(0, 0.1, (c,))).astype(np.float32)
        for i, c in enumerate(_TAP_CHANNELS)
    }
    return {"features": feats, "lins": lins}


def _conv(x, p, stride: int, pad: int):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["kernel"]),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.asarray(p["bias"])


def _maxpool_3x3s2(x):
    # torch MaxPool2d(3, 2): VALID padding, floor division on the output size.
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _taps(features: Mapping, x):
    outs = []
    for name, _cin, _cout, _k, stride, pad, pool_before in _STAGES:
        if pool_before:
            x = _maxpool_3x3s2(x)
        x = jax.nn.relu(_conv(x, features[name], stride, pad))
        outs.append(x)
    return outs


def _unit_normalize(x, eps: float = 1e-10):
    # Official: x / (||x||_channel + eps) — note + eps, not inside the sqrt.
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params: Mapping, img0, img1):
    """LPIPS(img0, img1) for NHWC RGB batches in [0, 1] -> (B,) distances."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def pre(img):
        x = jnp.asarray(img, jnp.float32) * 2.0 - 1.0
        return (x - shift) / scale

    taps0 = _taps(params["features"], pre(img0))
    taps1 = _taps(params["features"], pre(img1))
    total = 0.0
    for i, (f0, f1) in enumerate(zip(taps0, taps1)):
        d = jnp.square(_unit_normalize(f0) - _unit_normalize(f1))
        w = jnp.asarray(params["lins"][f"lin{i}"])
        # 1x1 non-negative conv == channel dot; then spatial mean.
        total = total + jnp.mean(jnp.einsum("bhwc,c->bhw", d, w), axis=(1, 2))
    return total


lpips_distance_jit = jax.jit(lpips_distance)


def lpips_from_torch_files(alexnet_path: str, lins_path: str) -> Dict:
    """Load + validate the two released files into an apply-ready tree.

    alexnet_path: torchvision `alexnet-owt-*.pth` (backbone, ImageNet).
    lins_path:    lpips package `weights/v0.1/alex.pth` (calibrated heads).
    """
    import torch

    alex = torch.load(alexnet_path, map_location="cpu", weights_only=True)
    lins = torch.load(lins_path, map_location="cpu", weights_only=True)
    return {
        "features": convert_alexnet_features({k: v.numpy() for k, v in alex.items()}),
        "lins": convert_lpips_lins({k: v.numpy() for k, v in lins.items()}),
    }
