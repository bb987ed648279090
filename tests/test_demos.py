"""Demo entry-point tests with tiny models on the real reference demo images
(the reference's smoke-test layer, SURVEY.md §4: demo.sh -> visual_*.py)."""

import numpy as np
import pytest

from tests.test_pipeline_e2e import tiny_models  # fixture reuse  # noqa: F401


def test_demo_dinov2_heatmap(tiny_models, tmp_path):  # noqa: F811
    from pope_tpu.pipeline.demos import demo_dinov2_heatmap

    out = tmp_path / "headmap.jpg"
    heat = demo_dinov2_heatmap(
        tiny_models, "/root/reference/data/demos/inputs/target.png", str(out), size=196
    )
    assert out.exists()
    assert heat.shape == (196, 196, 3)


def test_demo_sam_masks(tiny_models, tmp_path):  # noqa: F811
    from pope_tpu.pipeline.demos import demo_sam_masks

    out = tmp_path / "mask.png"
    render = demo_sam_masks(
        tiny_models, "/root/reference/data/demos/inputs/target.png", str(out)
    )
    assert out.exists()
    assert render.shape[2] == 3


def test_demo_3dbbox(tiny_models, tmp_path):  # noqa: F811
    from pope_tpu.pipeline.demos import demo_3dbbox

    K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
    prompt_pose = np.hstack([np.eye(3), [[0], [0], [0.5]]])
    corners = np.array(
        [[x, y, z] for x in (-0.05, 0.05) for y in (-0.05, 0.05) for z in (-0.05, 0.05)]
    )
    out_q = tmp_path / "query_result.png"
    out_b = tmp_path / "3D_BBox.png"
    vis, corr, result = demo_3dbbox(
        tiny_models,
        "/root/reference/data/demos/inputs/prompt.png",
        "/root/reference/data/demos/inputs/target.png",
        K, K, prompt_pose, corners,
        out_query=str(out_q), out_bbox=str(out_b),
    )
    assert out_q.exists() and out_b.exists()
    assert np.isfinite(np.asarray(result.R)).all()
