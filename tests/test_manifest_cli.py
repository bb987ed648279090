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
    with pytest.raises(SystemExit):
        # --serial contradicts the batched/sharded flags; rejected loudly
        # instead of silently ignoring them
        cli_main(["eval", "--dataset", "linemod", "--serial", "--dp", "4"])
    with pytest.raises(SystemExit):
        cli_main(["eval", "--dataset", "linemod", "--serial", "--batch-size", "8"])


def test_parse_lm_converter(tmp_path):
    """CDPN-format LINEMOD -> OnePose layout (parse_lm_real_data.py): seq
    naming, compact-percent crop + K update, per-object box3d/diameter
    metadata, and the parse-lm CLI wiring."""
    import cv2
    import numpy as np

    base = tmp_path / "cdpn"
    seq = base / "real_train" / "ape"
    seq.mkdir(parents=True)
    (base / "models").mkdir()
    (base / "models" / "models_info.txt").write_text(
        "1 diameter 102.099 min_x -37.93 min_y -38.79 min_z -45.88 "
        "size_x 75.86 size_y 77.59 size_z 91.76\n"
    )
    rng = np.random.default_rng(3)
    pose = np.hstack([np.eye(3), np.array([[0.0], [0.0], [0.6]])])
    for i in (0, 1):
        img = rng.uniform(0, 255, (480, 640, 3)).astype(np.uint8)
        cv2.imwrite(str(seq / f"{i}-color.png"), img)
        np.savetxt(str(seq / f"{i}-pose.txt"), pose)
        np.savetxt(str(seq / f"{i}-box.txt"), np.array([200, 150, 120, 100]))

    out = tmp_path / "onepose"
    cli_main([
        "parse-lm", "--data-base-dir", str(base), "--output-dir", str(out),
        "--obj-id", "1", "--splits", "train",
    ])

    obj = out / "0801-lm1-others"
    sd = obj / "lm1-1"
    for sub in ("color", "color_full", "intrin", "intrin_ba", "poses_ba"):
        assert len(list((sd / sub).iterdir())) == 2, sub
    assert cv2.imread(str(sd / "color" / "0.png")).shape == (256, 256, 3)
    assert cv2.imread(str(sd / "color_full" / "0.png")).shape == (480, 640, 3)
    corners = np.loadtxt(str(obj / "box3d_corners.txt"))
    assert corners.shape == (8, 3)
    # half-extents in meters from models_info size_* mm
    np.testing.assert_allclose(
        np.abs(corners).max(0), [75.86 / 2000, 77.59 / 2000, 91.76 / 2000]
    )
    np.testing.assert_allclose(np.loadtxt(str(obj / "diameter.txt")), 102.099 / 1000)
    # crop intrinsics: the converter must expand the box by compact_percent
    # (x0 = 200 - 0.3*120 = 164, y0 = 150 - 0.3*100 = 120 -> box 192x160)
    # and compose the two-stage K' = T.K update (crop at native size, then
    # resize to 256; the affine itself is cv2-parity-pinned in test_affine)
    from pope_tpu.geometry.affine import get_K_crop_resize
    from pope_tpu.eval.parse_lm import LM_K

    K = np.loadtxt(str(sd / "intrin_ba" / "0.txt"))
    K1, _ = get_K_crop_resize(np.array([164.0, 120.0, 356.0, 280.0]), LM_K, (160, 192))
    K2, _ = get_K_crop_resize(np.array([0.0, 0.0, 192.0, 160.0]), np.asarray(K1), (256, 256))
    np.testing.assert_allclose(K, np.asarray(K2), rtol=1e-5)
    # aspect-preserving: both focal lengths scale uniformly
    np.testing.assert_allclose(K[0, 0] / LM_K[0, 0], K[1, 1] / LM_K[1, 1], rtol=1e-6)
    np.testing.assert_allclose(np.loadtxt(str(sd / "intrin" / "0.txt")), LM_K)
    np.testing.assert_allclose(np.loadtxt(str(sd / "poses_ba" / "0.txt")), pose)
