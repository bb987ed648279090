"""Interactive segmentation web demo — the reference's browser demo, TPU-native.

Reference behavior: segment_anything/demo/ — a React+ONNX app that loads a
PRE-COMPUTED image embedding (.npy, exported from a notebook) plus the
quantized SAM decode head (sam_onnx_quantized_example.onnx) and predicts a
mask per cursor move / click in the browser (App.tsx;
components/helpers/onnxModelAPI.tsx builds the prompt tensors: clicks scaled
by samScale, one pad point (0,0) with label -1, empty 256x256 mask_input,
has_mask_input=0; maskUtils.tsx thresholds logits at 0.0 and overlays RGB
(0, 114, 189)).

TPU-native split of the same design: the ViT-H encoder runs ONCE per image on
the accelerator (the ".npy embedding export" step collapses into server
startup), and every click is answered by the SMALL exported prompt->mask head
— the jax.export StableHLO artifact from export.export_sam_prompt_head, i.e.
the exact jax-world analogue of the ONNX decode head the reference ships to
onnxruntime-web. The client is a single dependency-free HTML page (no
React/yarn build): hover for live prediction, left-click to pin foreground
points, right-click background points, 'r' to reset — matching the reference
demo's interaction surface.

Static-shape note (XLA): the ONNX head takes a dynamic point count; the
exported head takes a fixed capacity P, and the server extends the
reference's single (0,0)/-1 pad point to "pad to capacity" (label -1 slots
are no-ops in the prompt encoder, prompt_encoder.py:81-86), which is
bit-equivalent for any click count <= P-1.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp


class WebDemo:
    """Holds one image's cached embedding + the exported decode head.

    Mirrors the reference demo's data flow: `IMAGE_EMBEDDING` (cached
    encoder output) + `MODEL_DIR` (the exported head) + per-click prompt
    tensors (onnxModelAPI.tsx).
    """

    def __init__(self, sam, variables, image_rgb: np.ndarray, max_points: int = 8):
        from pope_tpu.export import export_sam_prompt_head, load_exported
        from pope_tpu.models.sam.predictor import SamPredictor

        self.max_points = int(max_points)
        self.image_rgb = np.ascontiguousarray(image_rgb)
        self.orig_hw: Tuple[int, int] = tuple(image_rgb.shape[:2])
        self.img_size = sam.config.encoder.img_size

        # "Export the image embedding" (demo/README.md): encode once, cache.
        predictor = SamPredictor(sam, variables)
        predictor.set_image(self.image_rgb)
        self.embedding = predictor.features
        self.input_hw = predictor.input_hw

        # "Export the ONNX model" (demo/README.md): the serialized decode
        # head; served clicks run this artifact, not Python model code.
        blob = export_sam_prompt_head(
            sam, variables, orig_hw=self.orig_hw,
            num_points=self.max_points, return_single_mask=True,
        )
        self._head = load_exported(blob).call
        low = 4 * sam.config.image_embedding_size
        self._empty_mask = jnp.zeros((1, low, low, 1), jnp.float32)
        self._no_mask = jnp.zeros((1,), jnp.float32)

    def predict(self, points, labels):
        """points: (N, 2) float in ORIGINAL image coords (x, y); labels:
        (N,) in {1 fg, 0 bg}. Returns (mask bool (H, W), score float)."""
        from pope_tpu.models.sam.sam import apply_coords

        pts = np.asarray(points, np.float32).reshape(-1, 2)
        lbl = np.asarray(labels, np.float32).reshape(-1)
        # the exported head has a STATIC point capacity (one slot reserved
        # for the pad point); past it, keep the MOST RECENT points — the
        # client appends the live hover point last, so dropping the oldest
        # pin keeps the preview following the cursor instead of freezing
        n = min(len(pts), self.max_points - 1)
        coords = np.zeros((1, self.max_points, 2), np.float32)
        lab = np.full((1, self.max_points), -1.0, np.int32)
        coords[0, :n] = pts[len(pts) - n:]
        lab[0, :n] = lbl[len(pts) - n:].astype(np.int32)
        # samScale (scaleHelper.tsx) == resize-longest-side coord transform
        coords = np.asarray(apply_coords(jnp.asarray(coords), self.orig_hw, self.img_size))

        # the browser client counts clicks + its one pad point (onnxModelAPI)
        click_count = jnp.asarray([n + 1.0], jnp.float32)
        masks, scores, _ = self._head(
            self.embedding, jnp.asarray(coords), jnp.asarray(lab),
            self._empty_mask, self._no_mask, click_count,
        )
        mask = np.asarray(masks[0, 0]) > 0.0  # mask_threshold (maskUtils.tsx)
        return mask, float(np.asarray(scores[0, 0]))

    def mask_png(self, mask: np.ndarray) -> bytes:
        """Blue-overlay RGBA PNG of a boolean mask (maskUtils.tsx color)."""
        import cv2

        h, w = mask.shape
        rgba = np.zeros((h, w, 4), np.uint8)
        rgba[mask] = (189, 114, 0, 160)  # BGR(A) for cv2 == RGB (0,114,189)
        ok, buf = cv2.imencode(".png", rgba)
        assert ok
        return buf.tobytes()

    def image_png(self) -> bytes:
        import cv2

        ok, buf = cv2.imencode(".png", self.image_rgb[:, :, ::-1])
        assert ok
        return buf.tobytes()


INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>POPE-TPU — interactive segmentation</title>
<style>
 body { font-family: system-ui, sans-serif; margin: 2rem; background: #111; color: #eee; }
 #stage { position: relative; display: inline-block; cursor: crosshair; }
 #stage img, #stage canvas { display: block; max-width: 90vw; }
 #mask { position: absolute; left: 0; top: 0; pointer-events: none; }
 .hint { color: #9aa; font-size: 0.9rem; }
</style></head><body>
<h2>POPE-TPU interactive segmentation</h2>
<p class="hint">hover: live mask &middot; left-click: pin foreground point &middot;
right-click: background point &middot; <b>r</b>: reset &middot;
score: <span id="score">&ndash;</span></p>
<div id="stage"><img id="im" src="image"><img id="mask"></div>
<script>
const im = document.getElementById('im'), mask = document.getElementById('mask');
const score = document.getElementById('score');
let clicks = [], busy = false, pendingHover = null;
function scalePt(ev) {
  const r = im.getBoundingClientRect();
  return [ (ev.clientX - r.left) * im.naturalWidth / r.width,
           (ev.clientY - r.top) * im.naturalHeight / r.height ];
}
async function predict(points, labels) {
  if (busy) { pendingHover = [points, labels]; return; }
  busy = true;
  try {
    const res = await fetch('predict', { method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({points: points, labels: labels}) });
    const out = await res.json();
    mask.src = 'data:image/png;base64,' + out.mask_png;
    mask.style.width = im.getBoundingClientRect().width + 'px';
    score.textContent = out.score.toFixed(3);
  } finally {
    busy = false;
    if (pendingHover) { const [p, l] = pendingHover; pendingHover = null; predict(p, l); }
  }
}
im.addEventListener('mousemove', ev => {
  const p = scalePt(ev);
  predict(clicks.map(c => c.p).concat([p]), clicks.map(c => c.l).concat([1]));
});
im.addEventListener('click', ev => { clicks.push({p: scalePt(ev), l: 1}); });
im.addEventListener('contextmenu', ev => {
  ev.preventDefault(); clicks.push({p: scalePt(ev), l: 0});
});
document.addEventListener('keydown', ev => {
  if (ev.key === 'r') { clicks = []; mask.removeAttribute('src'); score.textContent = '\\u2013'; }
});
</script></body></html>
"""


def make_demo_server(demo: WebDemo, host: str = "127.0.0.1", port: int = 0):
    """Build (but don't start) the HTTP server. Routes: GET / (client page),
    GET /image (the frame), GET /meta, POST /predict ({points, labels} ->
    {mask_png (base64), score})."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, "text/html; charset=utf-8", INDEX_HTML.encode())
            elif self.path == "/image":
                self._send(200, "image/png", demo.image_png())
            elif self.path == "/meta":
                meta = {"hw": list(demo.orig_hw), "max_points": demo.max_points}
                self._send(200, "application/json", json.dumps(meta).encode())
            else:
                self._send(404, "text/plain", b"not found")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, "text/plain", b"not found")
                return
            n = int(self.headers.get("Content-Length", "0"))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
                pts = req.get("points", [])
                lbl = req.get("labels", [1] * len(pts))
                if not pts:
                    self._send(400, "text/plain", b"no points")
                    return
                mask, s = demo.predict(pts, lbl)
                body = json.dumps({
                    "score": s,
                    "area": int(mask.sum()),
                    "mask_png": base64.b64encode(demo.mask_png(mask)).decode(),
                }).encode()
                self._send(200, "application/json", body)
            except Exception as e:  # surface errors to the client, keep serving
                self._send(500, "application/json", json.dumps({"error": str(e)}).encode())

    return ThreadingHTTPServer((host, port), Handler)


def run_demo_server(demo: WebDemo, host: str = "127.0.0.1", port: int = 8081,
                    background: bool = False):
    """Start serving (reference demo listens on :8081, demo/README.md)."""
    srv = make_demo_server(demo, host, port)
    if background:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return srv
    print(f"serving interactive demo on http://{host}:{srv.server_address[1]}/")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return srv
