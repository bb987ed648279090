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
