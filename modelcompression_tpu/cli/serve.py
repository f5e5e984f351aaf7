"""Serve CLI — a batching HTTP inference daemon over the ONE fused
serving program (letterbox -> forward -> decode -> NMS -> source-pixel
boxes; the same program eval/detect use).

The production-serving shape for this hardware: requests are decoded and
letterboxed on host threads, then gathered into fixed-size device
batches (one compiled program, padded final rows never read back per
request) by a single dispatch thread — the TPU sees only batch-``B``
executions of one XLA executable, which is exactly the BASELINE.json:11
streaming-inference configuration. Serves any artifact the framework
produces: f32 ``.weights``, int8 ``--qmodel``, weight-sharing
``--cmodel``.

Endpoints:
  POST /detect     image file bytes (jpeg/png/bmp) -> JSON detections in
                   source-image pixel coordinates
  GET  /healthz    liveness + model info
  GET  /stats      request/batch counters, mean batch fill, throughput

Example:
  serve --cfg yolov2-voc.cfg --weights yolov2.weights --port 8000 \
        --batch 16 --max-wait-ms 5
  curl -s --data-binary @dog.jpg localhost:8000/detect | jq .
"""

from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from modelcompression_tpu.cli.common import (
    add_model_args, enable_compilation_cache, load_serving_model,
    prepare_serving, run_padded_batch, unpack_detections,
)
from modelcompression_tpu.data.preprocess import letterbox_host
from modelcompression_tpu.data.voc import VOC_CLASSES, read_names
from modelcompression_tpu.evaluation import EvalConfig, make_eval_step

MAX_BODY = 64 * 1024 * 1024


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="serve", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    add_model_args(p, weights_required=False)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch", type=int, default=16,
                   help="compiled device batch size (requests are "
                        "gathered up to this many per dispatch)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="how long the dispatcher waits to fill a batch "
                        "after the first request arrives (latency vs "
                        "batch-fill trade)")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--nms", type=float, default=0.45)
    p.add_argument("--soft-nms", choices=("linear", "gaussian"),
                   default=None,
                   help="Soft-NMS score decay instead of greedy erasure "
                        "(accuracy knob for dense/overlapping scenes)")
    p.add_argument("--diou-nms", action="store_true",
                   help="DIoU-NMS: greedy suppression on IoU minus the "
                        "center-distance penalty (occluded objects)")
    p.add_argument("--max-detections", type=int, default=50)
    p.add_argument("--names", default=None, help=".names file")
    p.add_argument("--qmodel", default=None, metavar="PATH",
                   help="serve a saved int8 deployment artifact")
    p.add_argument("--cmodel", default=None, metavar="PATH",
                   help="serve a saved weight-sharing artifact")
    p.add_argument("--timeout-s", type=float, default=60.0,
                   help="per-request wait bound for a batch slot")
    p.add_argument("--verbose", action="store_true",
                   help="per-request access log on stderr")
    return p


class _Pending:
    __slots__ = ("canvas", "w", "h", "event", "result", "error",
                 "abandoned")

    def __init__(self, canvas, w, h):
        self.canvas = canvas
        self.w = w
        self.h = h
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.abandoned = False  # set by a waiter that already timed out


class ServeState:
    """Model + batcher shared by the HTTP handlers and the dispatcher."""

    def __init__(self, spec, params, step, names, args):
        self.spec = spec
        self.params = params
        self.step = step
        self.names = names
        self.batch = max(1, args.batch)
        self.max_wait = max(0.0, args.max_wait_ms) / 1e3
        self.timeout_s = args.timeout_s
        self.verbose = args.verbose
        # BOUNDED queue = backpressure: a burst beyond device throughput
        # gets an immediate 503 from submit() instead of accumulating
        # letterboxed uint8 canvases in memory while every waiter blocks
        # toward --timeout-s and burns a late 503 anyway. 4 batches of
        # depth keeps the dispatcher fed across its gather window.
        self.q: "queue.Queue[_Pending]" = queue.Queue(
            maxsize=max(4 * self.batch, 16))
        self.stop = threading.Event()
        self.lock = threading.Lock()
        self.n_requests = 0
        self.n_images = 0
        self.n_batches = 0
        self.n_rejected = 0
        self.t_start = time.monotonic()

    def submit(self, canvas, w, h) -> Optional[_Pending]:
        """Enqueue for the next batch; None = queue full (caller sends
        503 immediately — the backpressure contract)."""
        item = _Pending(canvas, w, h)
        with self.lock:
            self.n_requests += 1
        try:
            self.q.put_nowait(item)
        except queue.Full:
            with self.lock:
                self.n_rejected += 1
            return None
        return item

    def dispatch_loop(self):
        """Single thread owning the device: gather -> pad -> one fused
        execution -> distribute. Runs until ``stop`` is set."""
        while not self.stop.is_set():
            try:
                first = self.q.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.monotonic() + self.max_wait
            while len(items) < self.batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    items.append(self.q.get(timeout=left))
                except queue.Empty:
                    break
            # drop waiters that already timed out (503 sent) — don't burn
            # a device batch on results nobody will read
            items = [it for it in items if not it.abandoned]
            if not items:
                continue
            try:
                sel, sc, valid = run_padded_batch(
                    self.step, self.params,
                    [it.canvas for it in items],
                    [it.w for it in items],
                    [it.h for it in items], self.batch)
            except Exception as e:  # surface the failure to every waiter
                for it in items:
                    it.error = f"inference failed: {e!r}"
                    it.event.set()
                continue
            for j, it in enumerate(items):
                dets = unpack_detections(sel[j], sc[j], valid[j],
                                         it.w, it.h)
                for d in dets:
                    d["name"] = self.names[d["class_id"]]
                it.result = dets
                it.event.set()
            with self.lock:
                self.n_images += len(items)
                self.n_batches += 1

    def stats(self) -> dict:
        with self.lock:
            wall = time.monotonic() - self.t_start
            return {
                "requests": self.n_requests,
                "images": self.n_images,
                "batches": self.n_batches,
                "rejected": self.n_rejected,
                "mean_batch_fill": (self.n_images / self.n_batches
                                    if self.n_batches else 0.0),
                "compiled_batch": self.batch,
                "uptime_s": round(wall, 1),
                "img_per_sec_wall": (self.n_images / wall
                                     if wall > 0 else 0.0),
            }


def _make_handler(state: ServeState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *a):
            if state.verbose:
                sys.stderr.write("%s - %s\n" % (self.address_string(),
                                                fmt % a))

        def _send_json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if self.close_connection:  # early-return paths: body unread
                self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(200, {
                    "ok": True,
                    "classes": state.spec.region.classes,
                    "net": [state.spec.net.height, state.spec.net.width],
                    "batch": state.batch,
                })
            elif self.path == "/stats":
                self._send_json(200, state.stats())
            else:
                self._send_json(404, {"error": "not found"})

        def do_POST(self):
            if self.path.split("?")[0] != "/detect":
                # body unread: a keep-alive client's next request would
                # otherwise parse the leftover bytes as a request line
                self.close_connection = True
                self._send_json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                n = 0
            if n <= 0 or n > MAX_BODY:
                self.close_connection = True  # body unread (see above)
                self._send_json(400, {"error": "bad Content-Length"})
                return
            body = self.rfile.read(n)
            import cv2
            img = cv2.imdecode(np.frombuffer(body, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self._send_json(400, {"error": "cannot decode image"})
                return
            h, w = img.shape[:2]
            canvas, _, _, _ = letterbox_host(
                img[:, :, ::-1], state.spec.net.height,
                state.spec.net.width)
            item = state.submit(canvas, float(w), float(h))
            if item is None:  # bounded queue full — shed load now
                self._send_json(503, {"error": "server overloaded"})
                return
            if not item.event.wait(state.timeout_s):
                # tell the dispatcher not to spend a batch slot on us
                # (best-effort: it may already have gathered this item)
                item.abandoned = True
                self._send_json(503, {"error": "inference timed out"})
                return
            if item.error is not None:
                self._send_json(500, {"error": item.error})
                return
            self._send_json(200, {
                "width": w,
                "height": h,
                "detections": item.result,
            })

    return Handler


def build_server(args) -> "tuple[ThreadingHTTPServer, ServeState]":
    """Load the model, compile the fused program (one warm-up batch),
    and return (httpd, state) with the dispatcher ALREADY running —
    callers (main / tests) only serve_forever()/shutdown()."""
    spec, params, quantized = load_serving_model(args)
    names = read_names(args.names) if args.names else list(VOC_CLASSES)
    if len(names) != spec.region.classes:
        names = [f"class{i}" for i in range(spec.region.classes)]
    cfg = EvalConfig(conf_thresh=args.conf, nms_thresh=args.nms,
                     max_detections=args.max_detections,
                     soft_nms=args.soft_nms or "",
                     diou_nms=args.diou_nms)
    folded = prepare_serving(spec, params, quantized, cfg)
    step = make_eval_step(spec, cfg)
    state = ServeState(spec, folded, step, names, args)

    # warm-up: pay the (remote) compile before the first request. Goes
    # through run_padded_batch — the dispatcher's exact call path — so
    # the warm-up avals match the serving avals (jnp.full's weak-typed
    # f32 would trigger a SECOND full compile on the first real request)
    t0 = time.monotonic()
    dummy = np.zeros((spec.net.height, spec.net.width, 3), np.uint8)
    run_padded_batch(step, folded, [dummy], [float(spec.net.width)],
                     [float(spec.net.height)], state.batch)
    print(f"compiled batch-{state.batch} serving program in "
          f"{time.monotonic() - t0:.1f}s", file=sys.stderr)

    httpd = ThreadingHTTPServer((args.host, args.port),
                                _make_handler(state))
    worker = threading.Thread(target=state.dispatch_loop,
                              name="mc-tpu-dispatch", daemon=True)
    worker.start()
    return httpd, state


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if sum(map(bool, (args.weights, args.qmodel, args.cmodel))) != 1:
        print("error: exactly one of --weights, --qmodel or --cmodel is "
              "required", file=sys.stderr)
        return 2
    if args.batch < 1:
        print("error: --batch must be >= 1", file=sys.stderr)
        return 2
    enable_compilation_cache()
    try:
        httpd, state = build_server(args)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    host, port = httpd.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(batch {state.batch}, wait {state.max_wait * 1e3:.0f} ms, "
          f"conf {args.conf})", file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        state.stop.set()
        httpd.server_close()
        print(json.dumps(state.stats()), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
