"""Online pose service: continuous batching over the production pipeline.

The reference serves only its browser mask demo; the pose pipeline has no
online surface there (eval_linemod_json.py is a file loop). These tests pin
the service's contract: concurrent requests coalesce into fixed-shape
batches, padded slots are discarded, results are batch-composition-invariant
and deterministic per (inputs, name), and the HTTP layer round-trips.
"""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

# service build + first compile dominate (~70s on a 1-cpu box); the
# continuous-batching surface is covered in the slow suite
pytestmark = pytest.mark.slow

cv2 = pytest.importorskip("cv2")

from test_pipeline_e2e import _build_tiny_models

from pope_tpu.serve import PoseService, make_pose_server


@pytest.fixture(scope="module")
def tiny_models():
    return _build_tiny_models()


def _frame(seed, box=True):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (128, 160, 3)).astype(np.uint8)
    if box:
        cv2.rectangle(img, (40, 30), (110, 100), (250, 240, 20), -1)
    return img


K = np.array([[200.0, 0, 80], [0, 200, 64], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def service(tiny_models):
    svc = PoseService(tiny_models, crop_size=64, batch_size=2, max_wait_ms=30.0)
    yield svc
    svc.shutdown(drain=False)


def test_concurrent_requests_batch_and_resolve(service):
    futs = [
        service.submit(_frame(10 + i, box=False), _frame(20 + i), K, K, name=f"pair-{i}")
        for i in range(3)
    ]
    results = [f.result(timeout=600) for f in futs]
    for res in results:
        assert res["R"].shape == (3, 3) and res["t"].shape == (3,)
        assert np.isfinite(res["R"]).all() and np.isfinite(res["t"]).all()
        assert res["mkpts0"].shape == res["mkpts1"].shape
        assert res["mkpts0"].shape[0] == res["mconf"].shape[0]
        assert isinstance(res["ok"], bool) and res["pre_bbox"].shape == (4,)
    st = service.stats()
    assert st["requests"] >= 3 and st["batches"] >= 1
    # 3 requests through a B=2 service: at least one padded slot somewhere
    assert st["requests"] + st["padded_slots"] == 2 * st["batches"]


def test_batch_composition_invariance(service):
    """The same (frames, K, name) must produce identical results regardless
    of which other requests share its device batch (vmap semantics + the
    name-keyed PRNG — no cross-pair leakage through the batcher)."""
    img0, img1 = _frame(50, box=False), _frame(60)

    a = service.submit(img0, img1, K, K, name="anchor")
    b = service.submit(_frame(51, box=False), _frame(61), K, K, name="other-1")
    ra = a.result(timeout=600)

    c = service.submit(img0, img1, K, K, name="anchor")
    d = service.submit(_frame(52, box=False), _frame(62), K, K, name="other-2")
    rc = c.result(timeout=600)
    b.result(timeout=600), d.result(timeout=600)

    np.testing.assert_allclose(ra["R"], rc["R"], atol=1e-5)
    np.testing.assert_allclose(ra["t"], rc["t"], atol=1e-5)
    np.testing.assert_allclose(ra["mkpts1"], rc["mkpts1"], atol=1e-4)
    assert ra["ok"] == rc["ok"] and ra["n_strong"] == rc["n_strong"]


def test_frame_shape_pinning(service):
    with pytest.raises(ValueError):
        service.submit(
            np.zeros((64, 64, 3), np.uint8), np.zeros((64, 64, 3), np.uint8), K, K
        )
    with pytest.raises(ValueError):  # mismatched pair
        service.submit(
            np.zeros((128, 160, 3), np.uint8), np.zeros((64, 64, 3), np.uint8), K, K
        )


def test_http_pose_server(service):
    server = make_pose_server(service, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    try:
        def b64png(img):
            ok, buf = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            assert ok
            return base64.b64encode(buf.tobytes()).decode()

        payload = {
            "image0": b64png(_frame(70, box=False)),
            "image1": b64png(_frame(80)),
            "K0": K.tolist(),
            "K1": K.tolist(),
            "name": "http-pair",
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/pose",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = json.loads(resp.read())
        assert out["name"] == "http-pair"
        assert np.asarray(out["R"]).shape == (3, 3)
        assert len(out["mkpts0"]) == out["n_matches"] == len(out["mconf"])

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=60) as resp:
            st = json.loads(resp.read())
        assert st["requests"] >= 1 and 0 < st["batch_fill"] <= 1.0

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/pose", data=b'{"image0": "not-an-image"}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=60)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_shutdown_rejects_new_requests(tiny_models):
    svc = PoseService(tiny_models, crop_size=64, batch_size=2, max_wait_ms=1.0)
    svc.shutdown(drain=False)
    with pytest.raises(RuntimeError):
        svc.submit(_frame(1, box=False), _frame(2), K, K)
