from pope_tpu.nvs.nerf import (
    NerfConfig,
    NerfMLP,
    init_nerf,
    make_rays,
    render_image,
    render_rays,
    train_nerf,
)
from pope_tpu.nvs.driver import render_novel_views

__all__ = [
    "NerfConfig",
    "NerfMLP",
    "init_nerf",
    "make_rays",
    "render_rays",
    "render_image",
    "train_nerf",
    "render_novel_views",
]
