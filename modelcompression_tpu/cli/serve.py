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
import collections
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from modelcompression_tpu.cli.common import (
    add_model_args, add_serving_nms_args, dispatch_padded_batch,
    enable_compilation_cache, fetch_batch, load_serving_model,
    prepare_serving, resolve_serving_eval_config, run_padded_batch,
    unpack_detections,
)
from modelcompression_tpu.data.preprocess import letterbox_host
from modelcompression_tpu.data.voc import VOC_CLASSES, read_names
from modelcompression_tpu.evaluation import make_eval_step

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
                        "gathered up to this many per dispatch; 64 is "
                        "the measured headline point, 128 the "
                        "peak-throughput point — docs/PERF.md batch "
                        "scaling)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="how long the dispatcher waits to fill a batch "
                        "after the first request arrives (latency vs "
                        "batch-fill trade)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel serving: shard each device batch "
                        "over this many devices on a 'data' mesh axis "
                        "(GSPMD partitions the fused program; the "
                        "BASELINE.json:11 'TPU slice' streaming shape). "
                        "--batch must divide evenly. 0 = single device "
                        "(default)")
    add_serving_nms_args(p)
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
                 "abandoned", "t_submit")

    def __init__(self, canvas, w, h):
        self.canvas = canvas
        self.w = w
        self.h = h
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.abandoned = False  # set by a waiter that already timed out
        self.t_submit = time.monotonic()  # for /stats latency percentiles


class ServeState:
    """Model + batcher shared by the HTTP handlers and the dispatcher."""

    def __init__(self, spec, params, step, names, args, mesh=None):
        self.spec = spec
        self.params = params
        self.step = step
        self.names = names
        self.mesh = mesh  # 'data'-axis mesh when serving with --dp
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
        self.n_overlapped = 0  # batches dispatched while one was in flight
        self.latencies_ms = collections.deque(maxlen=4096)
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

    def _gather(self, first_timeout: float):
        """Collect up to one batch: block up to ``first_timeout`` for the
        first request, then up to max_wait to fill. Waiters that already
        timed out (503 sent) are dropped — don't burn a batch slot on
        results nobody will read."""
        try:
            first = self.q.get(timeout=first_timeout)
        except queue.Empty:
            return []
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
        return [it for it in items if not it.abandoned]

    def _dispatch(self, items):
        """Async-dispatch one padded batch; on a dispatch-time failure
        (tracing/shape errors) fail the waiters and return None."""
        try:
            return dispatch_padded_batch(
                self.step, self.params,
                [it.canvas for it in items],
                [it.w for it in items],
                [it.h for it in items], self.batch, mesh=self.mesh)
        except Exception as e:
            for it in items:
                it.error = f"inference failed: {e!r}"
                it.event.set()
            return None

    def _distribute(self, items, dev):
        """Fetch one dispatched batch's results and wake its waiters."""
        try:
            sel, sc, valid = fetch_batch(dev)
        except Exception as e:  # surface the failure to every waiter
            for it in items:
                it.error = f"inference failed: {e!r}"
                it.event.set()
            return
        now = time.monotonic()
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
            self.latencies_ms.extend(
                (now - it.t_submit) * 1e3 for it in items)

    def dispatch_loop(self):
        """Single thread owning the device: gather -> pad -> dispatch ->
        distribute, PIPELINED: while batch i executes on device, batch
        i+1 is gathered and dispatched, and only then are batch i's
        results fetched and unpacked (the eval pipeline's
        dispatch-then-fetch-previous pattern, evaluation/pipeline.py
        batch_results). Under load the device never waits for the host's
        fetch+decode window — on the tunnel each blocking fetch costs a
        full RTT. When the queue is idle there is nothing to overlap and
        the loop degenerates to the serial path (no added latency).
        Runs until ``stop`` is set."""
        pending = None  # (items, device outputs) in flight
        while not self.stop.is_set():
            if pending is None:
                items = self._gather(first_timeout=0.1)
                if not items:
                    continue
                dev = self._dispatch(items)
                pending = (items, dev) if dev is not None else None
            else:
                # non-blocking peek: overlap only if work is already
                # queued; otherwise fetch the in-flight batch straight
                # away rather than holding its waiters
                items = self._gather(first_timeout=0.0)
                nxt = None
                if items:
                    dev = self._dispatch(items)
                    if dev is not None:
                        nxt = (items, dev)
                        with self.lock:
                            self.n_overlapped += 1
                self._distribute(*pending)
                pending = nxt
        if pending is not None:  # shutdown: don't strand waiters
            self._distribute(*pending)

    def metrics_text(self) -> str:
        """Prometheus text exposition (v0.0.4) of the /stats counters —
        the scrape surface a production deployment points its monitoring
        at. Counter/gauge types follow the semantics of each stat."""
        s = self.stats()
        rows = [
            ("requests_total", "counter", s["requests"],
             "HTTP /detect requests accepted"),
            ("images_total", "counter", s["images"],
             "images inferred (completed batches)"),
            ("batches_total", "counter", s["batches"],
             "device batches dispatched and fetched"),
            ("rejected_total", "counter", s["rejected"],
             "requests rejected by queue backpressure (503)"),
            ("overlapped_batches_total", "counter", s["overlapped_batches"],
             "batches dispatched while a previous batch was in flight"),
            ("queue_depth", "gauge", s["queue_depth"],
             "requests waiting for a dispatch slot"),
            ("latency_ms_p50", "gauge", s["latency_ms_p50"],
             "p50 submit-to-result latency over the sliding window (ms)"),
            ("latency_ms_p99", "gauge", s["latency_ms_p99"],
             "p99 submit-to-result latency over the sliding window (ms)"),
            ("mean_batch_fill", "gauge", s["mean_batch_fill"],
             "mean images per dispatched batch"),
            ("compiled_batch", "gauge", s["compiled_batch"],
             "compiled device batch size"),
            ("uptime_seconds", "gauge", s["uptime_s"],
             "seconds since server start"),
            ("images_per_second_wall", "gauge", s["img_per_sec_wall"],
             "lifetime wall-clock image throughput"),
        ]
        out = []
        for name, typ, val, help_ in rows:
            full = f"mc_tpu_serve_{name}"
            out.append(f"# HELP {full} {help_}")
            out.append(f"# TYPE {full} {typ}")
            out.append(f"{full} {val}")
        return "\n".join(out) + "\n"

    def stats(self) -> dict:
        with self.lock:
            wall = time.monotonic() - self.t_start
            lats = sorted(self.latencies_ms)

            def pct(p):  # nearest-rank percentile over the window
                if not lats:
                    return 0.0
                return round(lats[min(len(lats) - 1,
                                      int(p / 100.0 * len(lats)))], 2)

            return {
                "requests": self.n_requests,
                "images": self.n_images,
                "batches": self.n_batches,
                "rejected": self.n_rejected,
                "overlapped_batches": self.n_overlapped,
                "queue_depth": self.q.qsize(),
                "latency_ms_p50": pct(50),
                "latency_ms_p99": pct(99),
                "latency_window": len(lats),
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
                cfg = getattr(state, "cfg", None)
                self._send_json(200, {
                    "ok": True,
                    "classes": state.spec.classes,
                    "net": [state.spec.net.height, state.spec.net.width],
                    "batch": state.batch,
                    "conf": cfg.conf_thresh if cfg else None,
                    "max_detections": cfg.max_detections if cfg else None,
                    "nms_prefilter": cfg.nms_prefilter if cfg else None,
                    "dp": (state.mesh.shape["data"]
                           if state.mesh is not None else 1),
                })
            elif self.path == "/stats":
                self._send_json(200, state.stats())
            elif self.path == "/metrics":
                body = state.metrics_text().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
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
    if len(names) != spec.classes:
        names = [f"class{i}" for i in range(spec.classes)]
    cfg = resolve_serving_eval_config(args, spec=spec)
    folded = prepare_serving(spec, params, quantized, cfg)
    step = make_eval_step(spec, cfg)
    mesh = None
    dp = getattr(args, "dp", 0)
    if dp > 1:
        # DP serving: params replicated on a 'data' mesh, every device
        # batch sharded over it in dispatch_padded_batch — GSPMD
        # partitions the one fused program (same mechanism as eval --dp)
        from modelcompression_tpu.core.mesh import MeshConfig, make_mesh
        from modelcompression_tpu.parallel import replicate
        if args.batch % dp:
            raise ValueError(
                f"--batch {args.batch} must be divisible by --dp {dp}")
        mesh = make_mesh(MeshConfig(data=dp))
        folded = replicate(folded, mesh)
    state = ServeState(spec, folded, step, names, args, mesh=mesh)
    state.cfg = cfg  # resolved EvalConfig (incl. --deployment preset)

    # warm-up: pay the (remote) compile before the first request. Goes
    # through run_padded_batch — the dispatcher's exact call path — so
    # the warm-up avals match the serving avals (jnp.full's weak-typed
    # f32 would trigger a SECOND full compile on the first real request)
    t0 = time.monotonic()
    dummy = np.zeros((spec.net.height, spec.net.width, 3), np.uint8)
    run_padded_batch(step, folded, [dummy], [float(spec.net.width)],
                     [float(spec.net.height)], state.batch, mesh=mesh)
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
          f"conf {state.cfg.conf_thresh}, K {state.cfg.max_detections}, "
          f"prefilter {state.cfg.nms_prefilter}"
          f"{', deployment preset' if args.deployment else ''}"
          + (f", dp {state.mesh.shape['data']}"
             if state.mesh is not None else "") + ")",
          file=sys.stderr)
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
