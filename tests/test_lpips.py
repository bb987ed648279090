"""LPIPS: torch-math parity with transplanted weights + converter manifests.

No pretrained LPIPS/AlexNet weights ship in this container (the reference's
own lpips import is external/broken, src/novel_view_render.py:13), so parity
is proven the same way the repo's other converters are: random weights in
the released layout, transplanted into an in-test torch implementation of
the official math, outputs compared.
"""

import numpy as np
import pytest

from pope_tpu.utils.lpips import (
    ALEXNET_MANIFEST,
    LPIPS_LINS_MANIFEST,
    LpipsStateMismatch,
    _STAGES,
    convert_alexnet_features,
    convert_lpips_lins,
    init_random_params,
    lpips_distance,
)

torch = pytest.importorskip("torch")


def _torch_state_dicts(params):
    """Re-express the jax param tree in the RAW released-file layouts."""
    alex = {}
    for i, (name, *_r) in zip((0, 3, 6, 8, 10), _STAGES):
        alex[f"features.{i}.weight"] = torch.tensor(
            params["features"][name]["kernel"].transpose(3, 2, 0, 1).copy()
        )
        alex[f"features.{i}.bias"] = torch.tensor(params["features"][name]["bias"])
    lins = {
        f"lin{i}.model.1.weight": torch.tensor(
            params["lins"][f"lin{i}"].reshape(1, -1, 1, 1).copy()
        )
        for i in range(5)
    }
    return alex, lins


def _torch_lpips(alex_sd, lins_sd, img0, img1):
    """The official LPIPS forward, written directly against torch ops."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def pre(img):
        x = torch.tensor(np.asarray(img, np.float32)).permute(0, 3, 1, 2)
        return ((x * 2 - 1) - shift) / scale

    def taps(x):
        outs = []
        specs = [  # (layer idx, stride, pad, pool_before)
            (0, 4, 2, False), (3, 1, 2, True), (6, 1, 1, True),
            (8, 1, 1, False), (10, 1, 1, False),
        ]
        for idx, stride, pad, pool in specs:
            if pool:
                x = F.max_pool2d(x, 3, 2)
            x = F.relu(F.conv2d(
                x, alex_sd[f"features.{idx}.weight"],
                alex_sd[f"features.{idx}.bias"], stride=stride, padding=pad,
            ))
            outs.append(x)
        return outs

    def unit(x):
        return x / (torch.sqrt(torch.sum(x * x, dim=1, keepdim=True)) + 1e-10)

    t0, t1 = taps(pre(img0)), taps(pre(img1))
    total = torch.zeros(img0.shape[0])
    for i, (f0, f1) in enumerate(zip(t0, t1)):
        d = (unit(f0) - unit(f1)) ** 2
        w = lins_sd[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(d, w).mean(dim=(1, 2, 3))
    return total.numpy()


def test_lpips_matches_torch_math(rng):
    params = init_random_params(7)
    img0 = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(np.float32)

    ours = np.asarray(lpips_distance(params, img0, img1))
    alex_sd, lins_sd = _torch_state_dicts(params)
    ref = _torch_lpips(alex_sd, lins_sd, img0, img1)

    assert ours.shape == (2,)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)
    # identical images -> exactly zero distance
    zero = np.asarray(lpips_distance(params, img0, img0))
    np.testing.assert_allclose(zero, 0.0, atol=1e-7)


def test_converters_round_trip(rng):
    params = init_random_params(11)
    alex_sd, lins_sd = _torch_state_dicts(params)
    feats = convert_alexnet_features({k: v.numpy() for k, v in alex_sd.items()})
    lins = convert_lpips_lins({k: v.numpy() for k, v in lins_sd.items()})
    for name in feats:
        np.testing.assert_array_equal(feats[name]["kernel"],
                                      params["features"][name]["kernel"])
        np.testing.assert_array_equal(feats[name]["bias"],
                                      params["features"][name]["bias"])
    for k in lins:
        np.testing.assert_array_equal(lins[k], params["lins"][k])


def test_converters_fail_loudly(rng):
    params = init_random_params(3)
    alex_sd, lins_sd = _torch_state_dicts(params)
    alex = {k: v.numpy() for k, v in alex_sd.items()}
    lins = {k: v.numpy() for k, v in lins_sd.items()}

    missing = dict(alex)
    del missing["features.6.weight"]
    with pytest.raises(LpipsStateMismatch, match="missing key: features.6.weight"):
        convert_alexnet_features(missing)

    wrong = dict(alex)
    wrong["features.0.weight"] = wrong["features.0.weight"][:, :1]
    with pytest.raises(LpipsStateMismatch, match="shape mismatch: features.0.weight"):
        convert_alexnet_features(wrong)

    unknown = dict(lins)
    unknown["lin5.model.1.weight"] = np.zeros((1, 9, 1, 1), np.float32)
    with pytest.raises(LpipsStateMismatch, match="unknown key: lin5"):
        convert_lpips_lins(unknown)

    # torchvision's classifier head is legitimately present and ignored
    with_head = dict(alex)
    with_head["classifier.1.weight"] = np.zeros((4096, 9216), np.float32)
    convert_alexnet_features(with_head)

    # manifests pin the released inventories
    assert len(ALEXNET_MANIFEST) == 10
    assert LPIPS_LINS_MANIFEST["lin0.model.1.weight"] == (1, 64, 1, 1)
