"""Demo entry-point tests with tiny models on the real reference demo images
(the reference's smoke-test layer, SURVEY.md §4: demo.sh -> visual_*.py)."""

import numpy as np
import pytest

from tests.test_pipeline_e2e import tiny_models  # fixture reuse  # noqa: F401

pytestmark = pytest.mark.slow  # heavy oracle/e2e surface; core suite skips


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
    """Golden-content checks against the reference demo semantics
    (visual_3dbbox.py:112-130): query_result.png is a 256x512 hstack of
    prompt + winning crop, 3D_BBox.png overlays box edges + axes on the
    target frame — both must differ from their unannotated sources (the
    reference checks these outputs by committed-image eyeball; here we
    assert shape + content-changed instead of byte equality)."""
    import cv2

    from pope_tpu.pipeline.demos import demo_3dbbox

    K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
    prompt_pose = np.hstack([np.eye(3), [[0], [0], [0.5]]])
    target_pose = np.hstack([np.eye(3), [[0.05], [0], [0.6]]])
    corners = np.array(
        [[x, y, z] for x in (-0.05, 0.05) for y in (-0.05, 0.05) for z in (-0.05, 0.05)]
    )
    out_q = tmp_path / "query_result.png"
    out_b = tmp_path / "3D_BBox.png"
    vis, stack, result = demo_3dbbox(
        tiny_models,
        "/root/reference/data/demos/inputs/prompt.png",
        "/root/reference/data/demos/inputs/target.png",
        K, K, prompt_pose, corners,
        target_pose=target_pose,
        out_query=str(out_q), out_bbox=str(out_b),
    )
    assert out_q.exists() and out_b.exists()
    assert np.isfinite(np.asarray(result.R)).all()
    # query_result: prompt (256) beside crop (256)
    q = cv2.imread(str(out_q))
    assert q.shape == (256, 512, 3)
    # left half is the resized prompt; right half is a non-constant crop
    prompt = cv2.resize(cv2.imread("/root/reference/data/demos/inputs/prompt.png"), (256, 256))
    np.testing.assert_array_equal(q[:, :256], prompt)
    assert q[:, 256:].std() > 1.0, "crop half is blank"
    # 3D_BBox: bbox/axis overlay actually modified the target frame
    b = cv2.imread(str(out_b))
    tgt = cv2.imread("/root/reference/data/demos/inputs/target.png")
    assert b.shape == tgt.shape
    assert (b != tgt).any(), "no bbox/axes drawn"
