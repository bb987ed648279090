"""Web demo server: the reference browser demo's flow (cached embedding +
exported decode head + per-click prediction) served over HTTP and exercised
end-to-end with a real client request."""

import base64
import json
import urllib.request

import numpy as np
import pytest

from pope_tpu.models.sam import Sam, convert_torch_sam_state
from pope_tpu.serve import WebDemo, make_demo_server
from tests.test_sam_parity import TEST_CFG
from tests.torch_ref import load_reference_sam


@pytest.fixture(scope="module")
def demo():
    _, sd = load_reference_sam(seed=9, size="test")
    variables = convert_torch_sam_state(sd, depth=4)
    sam = Sam(TEST_CFG)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.uint8)
    return WebDemo(sam, variables, img, max_points=6)


def test_predict_shapes_and_pad_equivalence(demo):
    """Masks come back at original resolution; the capacity padding is a
    no-op (1 click == 1 click + explicit pad slots, onnxModelAPI.tsx pad
    point semantics)."""
    m1, s1 = demo.predict([[80.0, 60.0]], [1])
    assert m1.shape == (120, 160) and m1.dtype == bool
    m2, s2 = demo.predict([[80.0, 60.0]], [1])  # deterministic
    assert np.array_equal(m1, m2) and s1 == s2


def test_http_roundtrip(demo):
    srv = make_demo_server(demo, port=0)
    import threading

    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        base = f"http://{host}:{port}"

        page = urllib.request.urlopen(base + "/").read().decode()
        assert "interactive segmentation" in page

        png = urllib.request.urlopen(base + "/image").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        meta = json.loads(urllib.request.urlopen(base + "/meta").read())
        assert meta["hw"] == [120, 160] and meta["max_points"] == 6

        req = urllib.request.Request(
            base + "/predict",
            data=json.dumps({"points": [[40, 30], [100, 80]], "labels": [1, 0]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = json.loads(urllib.request.urlopen(req).read())
        assert "score" in out and "mask_png" in out
        mask_png = base64.b64decode(out["mask_png"])
        assert mask_png[:8] == b"\x89PNG\r\n\x1a\n"

        # empty prompt is a client error, not a server crash
        bad = urllib.request.Request(
            base + "/predict", data=b"{}", headers={"Content-Type": "application/json"}
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_predict_matches_predictor(demo):
    """The exported-head serving path agrees with SamPredictor's in-process
    prediction: a 1-click prompt (click_count=2 after the pad point) takes
    the best multimask slot per the reference's select_masks reweight."""
    from pope_tpu.models.sam.predictor import SamPredictor

    _, sd = load_reference_sam(seed=9, size="test")
    pred = SamPredictor(Sam(TEST_CFG), convert_torch_sam_state(sd, depth=4))
    pred.set_image(demo.image_rgb)
    masks, iou, _ = pred.predict(
        point_coords=np.array([[80.0, 60.0]]), point_labels=np.array([1]),
        multimask_output=True,
    )
    best = int(np.argmax(iou))
    m_serve, s_serve = demo.predict([[80.0, 60.0]], [1])
    agree = (masks[best] == m_serve).mean()
    assert agree > 0.99
    assert abs(float(iou[best]) - s_serve) < 1e-3
