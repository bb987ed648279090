"""Online pose-estimation service: continuous batching over the fused
TPU pipeline.

The reference ships only an interactive mask demo
(segment_anything/demo/README.md — React + ONNX runtime in the browser);
its pose pipeline is batch/offline only (eval_linemod_json.py's file loop).
This module is the production-serving counterpart the reference lacks: a
request queue that coalesces concurrent pose requests into fixed-shape
device batches (static shapes -> one compiled program, no recompiles),
keeps ONE batch in flight while the next is collected (the device never
idles on request assembly), and pads ragged batches so the tail request
doesn't wait for traffic.

TPU-native rationale: single-pair latency through the tunnel is dominated
by per-dispatch RTT and under-filled matmuls; batching the pair axis is
the same lever the eval driver uses (runner.run_pairs), applied to a live
queue. Throughput scales with batch fill while p50 latency stays bounded
by max_wait_ms + one batch of device compute.
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np

from pope_tpu.pipeline.runner import _unpack_record, get_executor, pair_keys_np


class _Req:
    __slots__ = ("img0", "img1", "K0", "K1", "name", "future", "t_submit")

    def __init__(self, img0, img1, K0, K1, name):
        self.img0 = img0
        self.img1 = img1
        self.K0 = K0
        self.K1 = K1
        self.name = name
        self.future: Future = Future()
        self.t_submit = time.perf_counter()


class _Named:
    """pair_keys_np adapter (it reads .pair_name)."""

    def __init__(self, name: str):
        self.pair_name = name


class PoseService:
    """Continuous-batching pose service over a PopeModels bundle.

    Requests (`submit`) enqueue; a worker thread packs up to `batch_size`
    of them (waiting at most `max_wait_ms` after the first arrival to let a
    batch fill), pads short batches by repeating the last request (padding
    results are discarded), and drives the two production device programs —
    the single-dispatch AMG and the fused retrieve/match/solve — exactly
    like the eval runner. One batch stays queued on device while the next
    is collected (software pipelining; see runner.dispatch_pairs).

    All requests must share one frame shape (`frame_hw`, fixed at
    construction or pinned by the first request): a fixed camera stream is
    the deployment model, and static shapes are what keep XLA at one
    compiled program.
    """

    def __init__(
        self,
        models,
        crop_size: int = 256,
        batch_size: int = 4,
        max_wait_ms: float = 8.0,
        frame_hw: Optional[Tuple[int, int]] = None,
    ):
        self.models = models
        self.crop_size = crop_size
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.frame_hw = tuple(frame_hw) if frame_hw else None
        self._executor = get_executor(models, crop_size)
        self._q: "queue.Queue[_Req]" = queue.Queue()
        self._stats = {
            "requests": 0, "batches": 0, "padded_slots": 0,
            "latency_ms_sum": 0.0,
        }
        self._stats_lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._n = 0
        self._worker.start()

    # ---- client surface ----

    def submit(self, img0, img1, K0, K1, name: Optional[str] = None) -> Future:
        """Queue one pose request; resolves to the result dict (R, t, ok,
        pre_bbox, mkpts0/1, mconf, n_strong, telemetry)."""
        if self._stop.is_set():
            raise RuntimeError("service is shut down")
        img0 = np.asarray(img0, np.uint8)
        img1 = np.asarray(img1, np.uint8)
        if img0.shape != img1.shape or img0.ndim != 3:
            raise ValueError(f"frames must share (H, W, 3): {img0.shape} vs {img1.shape}")
        if self.frame_hw is None:
            self.frame_hw = img0.shape[:2]
        if tuple(img0.shape[:2]) != self.frame_hw:
            raise ValueError(
                f"service is pinned to {self.frame_hw} frames, got {img0.shape[:2]} "
                "(one compiled program per service; start another for a second stream)"
            )
        self._n += 1
        req = _Req(
            img0, img1,
            np.asarray(K0, np.float32).reshape(3, 3),
            np.asarray(K1, np.float32).reshape(3, 3),
            name or f"req-{self._n}",
        )
        self._q.put(req)
        return req.future

    def estimate(self, img0, img1, K0, K1, timeout: Optional[float] = None) -> dict:
        """Blocking convenience wrapper around submit()."""
        return self.submit(img0, img1, K0, K1).result(timeout=timeout)

    def stats(self) -> dict:
        with self._stats_lock:
            s = dict(self._stats)
        if s["requests"]:
            s["mean_latency_ms"] = s["latency_ms_sum"] / s["requests"]
        s.pop("latency_ms_sum", None)
        s["batch_fill"] = (
            s["requests"] / (s["requests"] + s["padded_slots"])
            if s["requests"] else 0.0
        )
        return s

    def shutdown(self, drain: bool = True):
        """Stop accepting requests; finish (or fail) queued ones."""
        self._stop.set()
        self._worker.join(timeout=60.0)
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if drain:
                try:
                    req.future.set_result(self._run_batch([req])[0])
                    continue
                except BaseException as e:  # pragma: no cover
                    req.future.set_exception(e)
                    continue
            req.future.set_exception(RuntimeError("service shut down"))

    # ---- worker ----

    def _collect(self) -> List[_Req]:
        """Block for the first request, then wait up to max_wait_ms for the
        batch to fill."""
        try:
            first = self._q.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.batch_size:
            left = deadline - time.perf_counter()
            if left <= 0:
                break
            try:
                batch.append(self._q.get(timeout=left))
            except queue.Empty:
                break
        return batch

    def _dispatch(self, batch: List[_Req]):
        """Queue the device side of one (padded) batch without syncing."""
        import jax

        n_real = len(batch)
        padded = batch + [batch[-1]] * (self.batch_size - n_real)
        img0 = jax.device_put(np.stack([r.img0 for r in padded]))
        img1 = jax.device_put(np.stack([r.img1 for r in padded]))
        K0 = jax.device_put(np.stack([r.K0 for r in padded]))
        K1 = jax.device_put(np.stack([r.K1 for r in padded]))
        keys = jax.device_put(pair_keys_np([_Named(r.name) for r in padded]))
        boxes_b, valid_b, dropped_b = self.models.amg.generate_boxes_batch(img1)
        run = self._executor.batched()
        small, matches = run(
            img0, img1, K0, K1, boxes_b, valid_b, None, keys, dropped_b,
            packed=True,
        )
        return batch, small, matches

    def _finish(self, pending):
        import jax

        batch, small, matches = pending
        small_b, matches_b = jax.device_get((small, matches))
        now = time.perf_counter()
        results = []
        for i, req in enumerate(batch):
            rec = _unpack_record(np.asarray(small_b[i]), np.asarray(matches_b[i]))
            out = {
                "name": req.name,
                "ok": bool(rec["ok"]),
                "R": np.asarray(rec["R"], np.float32),
                "t": np.asarray(rec["t"], np.float32),
                "pre_bbox": np.asarray(rec["pre_bbox"]).astype(int),
                "n_strong": int(rec["n_strong"]),
                "n_dropped_masks": int(rec["n_dropped_masks"]),
                "n_dropped_matches": int(rec["n_dropped_matches"]),
                "mkpts0": np.asarray(rec["mkpts0"])[rec["match_valid"]],
                "mkpts1": np.asarray(rec["mkpts1"])[rec["match_valid"]],
                "mconf": np.asarray(rec["mconf"])[rec["match_valid"]],
            }
            results.append(out)
            with self._stats_lock:
                self._stats["requests"] += 1
                self._stats["latency_ms_sum"] += (now - req.t_submit) * 1e3
        with self._stats_lock:
            self._stats["batches"] += 1
            self._stats["padded_slots"] += self.batch_size - len(batch)
        return results

    def _run_batch(self, batch: List[_Req]):
        return self._finish(self._dispatch(batch))

    def _loop(self):
        pending = None
        while not self._stop.is_set() or pending is not None:
            batch = [] if self._stop.is_set() else self._collect()
            nxt = None
            if batch:
                try:
                    # dispatch is async: batch N+1's programs queue on device
                    # while batch N's records are fetched/built below
                    nxt = self._dispatch(batch)
                except BaseException as e:
                    for req in batch:
                        req.future.set_exception(e)
            if pending is not None:
                bat = pending[0]
                try:
                    for req, res in zip(bat, self._finish(pending)):
                        req.future.set_result(res)
                except BaseException as e:
                    for req in bat:
                        if not req.future.done():
                            req.future.set_exception(e)
            pending = nxt


# ---- HTTP surface ----


def _result_json(res: dict) -> dict:
    return {
        "name": res["name"],
        "ok": res["ok"],
        "R": res["R"].tolist(),
        "t": res["t"].tolist(),
        "pre_bbox": res["pre_bbox"].tolist(),
        "n_strong": res["n_strong"],
        "n_matches": int(res["mkpts0"].shape[0]),
        "n_dropped_masks": res["n_dropped_masks"],
        "n_dropped_matches": res["n_dropped_matches"],
        "mkpts0": res["mkpts0"].tolist(),
        "mkpts1": res["mkpts1"].tolist(),
        "mconf": res["mconf"].tolist(),
    }


def _decode_image_b64(data: str) -> np.ndarray:
    import cv2

    buf = np.frombuffer(base64.b64decode(data), np.uint8)
    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("image field is not a decodable image")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def make_pose_server(service: PoseService, host: str = "127.0.0.1", port: int = 0):
    """Threaded HTTP server over a PoseService.

    POST /pose  {"image0": <b64 png/jpg>, "image1": <b64>, "K0": 3x3,
                 "K1": 3x3, ["name": str]}  ->  pose result json
    GET  /stats ->  {"requests", "batches", "batch_fill", "mean_latency_ms"}

    Concurrent POSTs batch together on the device (ThreadingHTTPServer gives
    each request a thread; PoseService coalesces them).
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/health", "/stats"):
                self._send(200, service.stats())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path.rstrip("/") != "/pose":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n))
                img0 = _decode_image_b64(payload["image0"])
                img1 = _decode_image_b64(payload["image1"])
                fut = service.submit(
                    img0, img1, payload["K0"], payload["K1"],
                    name=payload.get("name"),
                )
                self._send(200, _result_json(fut.result(timeout=600)))
            except (KeyError, ValueError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover
                self._send(500, {"error": str(e)})

    server = ThreadingHTTPServer((host, port), Handler)
    return server
