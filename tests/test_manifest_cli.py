"""Manifest path-convention tests (no dataset needed) + CLI surface smoke."""

import json

import pytest

from pope_tpu.cli import main as cli_main
from pope_tpu.eval.manifest import DATASETS, iter_pairs


def test_linemod_path_conventions():
    manifest = [{"0": ["0801-lm1-others/lm1-3/color/458.png-700.png"]}]
    paths = list(iter_pairs("/data", DATASETS["linemod"], manifest))
    assert len(paths) == 1
    p = paths[0]
    assert p.image0 == "/data/LM_dataset/0801-lm1-others/lm1-3/color/458.png"
    assert p.image1 == "/data/LM_dataset/0801-lm1-others/lm1-3/color_full/700.png"
    assert p.k0.endswith("intrin_ba/458.txt")
    assert p.k1.endswith("intrin/700.txt")
    assert p.pose0.endswith("poses_ba/458.txt")
    assert p.pose1.endswith("poses_ba/700.txt")
    assert p.box3d == "/data/LM_dataset/0801-lm1-others/box3d_corners.txt"


def test_onepose_path_conventions():
    manifest = [{"0": ["0409-aptamil-box/aptamil-2/color/123.png-130.png"]}]
    p = next(iter(iter_pairs("/d", DATASETS["onepose"], manifest)))
    assert p.image1.endswith("color/130.png")  # same dir, not color_full
    assert p.k1.endswith("intrin_ba/130.txt")
    assert DATASETS["onepose"].crop_size == 512  # eval_onepose_json.py:88


def test_ycbv_stride_and_split():
    pairs = [f"0801-1-other/1-3/color/{i}-1.png-{100+i}-1.png" for i in range(6)]
    manifest = [{"0": pairs}]
    out = list(iter_pairs("/d", DATASETS["ycbv"], manifest))
    assert len(out) == 3  # every 2nd pair (eval_ycb_json.py:35)
    p = out[0]
    # 'png-' split handles frame names containing '-'
    assert p.image0.endswith("color/0-1.png")
    assert p.image1.endswith("color_full/100-1.png")


def test_cli_surface():
    with pytest.raises(SystemExit):
        cli_main(["--help"])
    with pytest.raises(SystemExit):
        cli_main(["eval", "--dataset", "nonsense"])  # invalid choice
    with pytest.raises(SystemExit):
        cli_main(["amg"])  # missing required --input/--output
