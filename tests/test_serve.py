"""Serving daemon (cli/serve.py): batching HTTP inference over the one
fused serving program — request/response format, batching dispatcher,
and equality with the direct pipeline."""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from modelcompression_tpu.cli import serve
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import (
    dump_cfg, init_params, parse_cfg, save_weights,
)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    cfg_path = str(tmp / "net.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)

    args = serve.build_parser().parse_args(
        ["--cfg", cfg_path, "--weights", wpath, "--port", "0",
         "--batch", "2", "--max-wait-ms", "30", "--conf", "0.05"])
    httpd, state = serve.build_server(args)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    yield port, state, spec
    state.stop.set()
    httpd.shutdown()
    httpd.server_close()


def _img_bytes(seed=0, h=80, w=100):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return bytes(buf), img


def _post(port, body, path="/detect"):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=body, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_detect_endpoint_shape(server):
    port, state, spec = server
    body, img = _img_bytes(0)
    status, out = _post(port, body)
    assert status == 200
    assert out["width"] == 100 and out["height"] == 80
    assert isinstance(out["detections"], list)
    for d in out["detections"]:
        assert set(d) == {"class_id", "name", "score", "box"}
        x1, y1, x2, y2 = d["box"]
        assert 0 <= x1 <= 100 and 0 <= x2 <= 100
        assert 0 <= y1 <= 80 and 0 <= y2 <= 80
        assert 0.0 <= d["score"] <= 1.0
        assert 0 <= d["class_id"] < spec.region.classes
    # scores sorted descending
    scores = [d["score"] for d in out["detections"]]
    assert scores == sorted(scores, reverse=True)


def test_served_detections_match_direct_pipeline(server):
    port, state, spec = server
    body, img = _img_bytes(7)
    status, out = _post(port, body)
    assert status == 200

    # the same fused step, driven directly
    from modelcompression_tpu.data.preprocess import letterbox_host
    canvas, _, _, _ = letterbox_host(
        cv2.imdecode(np.frombuffer(body, np.uint8),
                     cv2.IMREAD_COLOR)[:, :, ::-1], 64, 64)
    batch = np.stack([canvas, canvas])  # server pads to its batch of 2
    sel, sc, valid, _, _ = state.step(
        state.params, jnp.asarray(batch),
        jnp.asarray([100.0, 100.0]), jnp.asarray([80.0, 80.0]))
    sel, sc, valid = (np.asarray(a) for a in (sel, sc, valid))
    direct = []
    for ci in range(sel.shape[1]):
        for k in np.nonzero(valid[0, ci])[0]:
            direct.append((ci, float(sc[0, ci, k])))
    got = [(d["class_id"], d["score"]) for d in out["detections"]]
    assert sorted(got) == pytest.approx(sorted(direct), rel=1e-5)


def test_concurrent_requests_batch(server):
    port, state, spec = server
    n0 = state.stats()["batches"]
    results = []

    def go(seed):
        body, _ = _img_bytes(seed)
        results.append(_post(port, body)[0])

    threads = [threading.Thread(target=go, args=(s,)) for s in (1, 2, 3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results == [200, 200, 200]
    st = state.stats()
    assert st["batches"] > n0
    assert st["requests"] >= 4  # earlier tests included


def test_health_and_stats_and_errors(server):
    port, state, spec = server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] and h["classes"] == 3 and h["net"] == [64, 64]

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30) as r:
        st = json.loads(r.read())
    assert st["compiled_batch"] == 2 and st["images"] >= st["requests"] - 1

    # undecodable body -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, b"not an image")
    assert ei.value.code == 400
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, b"x", path="/nope")
    assert ei.value.code == 404


def test_single_compiled_executable(server):
    """The startup warm-up must hit the SAME executable the dispatcher
    uses (identical avals incl. weak_type) — on the real TPU a retrace
    costs a second 20-50 s remote compile on the first live request."""
    port, state, spec = server
    body, _ = _img_bytes(11)
    status, _ = _post(port, body)
    assert status == 200
    assert state.step._cache_size() == 1


def test_keepalive_after_error_paths(server):
    """Early-return 404/400 leave the request body unread; the server
    must close the connection so a pooled client's next request isn't
    parsed out of the leftover body bytes."""
    import http.client
    port, state, spec = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    try:
        conn.request("POST", "/nope", body=b"leftover-bytes")
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        # server signalled close; a fresh request must still work (the
        # client reconnects instead of reusing a corrupted stream)
        assert r.getheader("Connection") == "close" or r.will_close
    finally:
        conn.close()
    body, _ = _img_bytes(12)
    status, out = _post(port, body)
    assert status == 200 and "detections" in out


def test_pipelined_dispatch_overlap_and_latency(server):
    """VERDICT r2 #2: under sustained load the dispatcher must PIPELINE —
    dispatch batch i+1 before fetching batch i's results (the eval
    pipeline's dispatch-then-fetch-previous pattern), observable as
    ``overlapped_batches`` > 0 in /stats — and report latency
    percentiles over the request window."""
    port, state, spec = server
    n_req = 12  # >> compiled batch of 2: keeps the queue non-empty
    results = []
    lock = threading.Lock()

    def go(seed):
        body, _ = _img_bytes(seed % 5 + 1)
        code = _post(port, body)[0]
        with lock:
            results.append(code)

    threads = [threading.Thread(target=go, args=(s,))
               for s in range(n_req)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert results == [200] * n_req

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30) as r:
        st = json.loads(r.read())
    # batches genuinely overlapped: at least one dispatch happened while
    # a previous batch was still in flight on the device
    assert st["overlapped_batches"] >= 1
    # latency percentiles over the sliding window are present and sane
    assert st["latency_window"] >= n_req
    assert 0.0 < st["latency_ms_p50"] <= st["latency_ms_p99"]
    assert "queue_depth" in st


def test_deployment_preset_resolution():
    """--deployment applies bench.py's measured configuration (conf 0.01,
    K=32, NMS prefilter 128 — docs/PERF.md headline); explicit flags
    override the preset; without it the classic demo defaults hold."""
    from modelcompression_tpu.cli.common import (
        DEPLOYMENT_PRESET, resolve_serving_eval_config,
    )
    parser = serve.build_parser()
    base = ["--cfg", "x.cfg", "--weights", "w.weights"]

    cfg = resolve_serving_eval_config(parser.parse_args(base))
    assert (cfg.conf_thresh, cfg.max_detections, cfg.nms_prefilter) == \
        (0.25, 50, 0)

    cfg = resolve_serving_eval_config(
        parser.parse_args(base + ["--deployment"]))
    assert cfg.conf_thresh == DEPLOYMENT_PRESET["conf"] == 0.01
    assert cfg.max_detections == DEPLOYMENT_PRESET["max_detections"] == 32
    assert cfg.nms_prefilter == DEPLOYMENT_PRESET["nms_prefilter"] == 128

    # explicit flags beat the preset, field by field
    cfg = resolve_serving_eval_config(parser.parse_args(
        base + ["--deployment", "--conf", "0.2",
                "--nms-prefilter", "64"]))
    assert cfg.conf_thresh == 0.2
    assert cfg.nms_prefilter == 64
    assert cfg.max_detections == 32  # untouched preset field survives

    # detect shares the same knob surface
    from modelcompression_tpu.cli import detect
    dcfg = resolve_serving_eval_config(detect.build_parser().parse_args(
        ["--cfg", "x.cfg", "--weights", "w.weights", "--image", "i.png",
         "--deployment"]))
    assert (dcfg.conf_thresh, dcfg.max_detections, dcfg.nms_prefilter) \
        == (0.01, 32, 128)


def test_healthz_reports_resolved_nms_config(server):
    """/healthz surfaces the resolved serving configuration so an
    operator can confirm which NMS point the daemon is running."""
    port, state, spec = server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["conf"] == pytest.approx(0.05)  # fixture's explicit --conf
    assert h["max_detections"] == 50 and h["nms_prefilter"] == 0


def test_metrics_endpoint_prometheus_format(server):
    """/metrics: Prometheus text exposition of the stats counters."""
    port, state, spec = server
    body, _ = _img_bytes(21)
    assert _post(port, body)[0] == 200
    req = urllib.request.Request(f"http://127.0.0.1:{port}/metrics")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    lines = text.strip().split("\n")
    # every metric has HELP + TYPE + value, prefixed consistently
    metrics = {}
    for ln in lines:
        if ln.startswith("#"):
            assert ln.split()[2].startswith("mc_tpu_serve_")
        else:
            name, val = ln.split()
            metrics[name] = float(val)
    assert metrics["mc_tpu_serve_requests_total"] >= 1
    assert metrics["mc_tpu_serve_images_total"] >= 1
    assert metrics["mc_tpu_serve_compiled_batch"] == 2
    assert "mc_tpu_serve_latency_ms_p99" in metrics
    assert text.count("# HELP") == text.count("# TYPE") == len(metrics)


def test_serve_yolov3_family(tmp_path):
    """The daemon serves the YOLOv3 family unchanged: the fused step is
    family-generic (make_eval_step -> decode_heads), so a multi-head
    [yolo] spec drives the same /detect contract."""
    from modelcompression_tpu.data.fixtures import tiny_yolo3_cfg

    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3, width=64, height=64))
    assert spec.is_multi_head
    params = init_params(spec, jax.random.key(2))
    cfg_path = str(tmp_path / "v3.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp_path / "v3.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)

    args = serve.build_parser().parse_args(
        ["--cfg", cfg_path, "--weights", wpath, "--port", "0",
         "--batch", "1", "--max-wait-ms", "10", "--conf", "0.05"])
    httpd, state = serve.build_server(args)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["classes"] == 3

        body, _ = _img_bytes(31, h=72, w=96)
        status, out = _post(port, body)
        assert status == 200
        assert out["width"] == 96 and out["height"] == 72
        for d in out["detections"]:
            x1, y1, x2, y2 = d["box"]
            assert 0 <= x1 <= 96 and 0 <= y1 <= 72
            assert 0 <= d["class_id"] < 3
    finally:
        state.stop.set()
        httpd.shutdown()
        httpd.server_close()


def test_serve_dp_matches_single_device(tmp_path):
    """VERDICT r3 #6: `serve --dp N` shards the fused serving program's
    batch over a 'data' mesh (the BASELINE.json:11 'TPU slice' shape).
    Served detections must equal the single-device direct pipeline."""
    from modelcompression_tpu.data.preprocess import letterbox_host

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(5))
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)

    args = serve.build_parser().parse_args(
        ["--cfg", cfg_path, "--weights", wpath, "--port", "0",
         "--batch", "4", "--dp", "2", "--max-wait-ms", "30",
         "--conf", "0.05"])
    httpd, state = serve.build_server(args)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        assert state.mesh is not None
        assert state.mesh.shape["data"] == 2
        port = httpd.server_address[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["dp"] == 2

        body, _ = _img_bytes(41)
        status, out = _post(port, body)
        assert status == 200

        # single-device twin of the same fused step on the same canvas
        canvas, _, _, _ = letterbox_host(
            cv2.imdecode(np.frombuffer(body, np.uint8),
                         cv2.IMREAD_COLOR)[:, :, ::-1], 64, 64)
        batch = np.stack([canvas] * 4)
        sel, sc, valid, _, _ = state.step(
            state.params, jnp.asarray(batch),
            jnp.asarray([100.0] * 4), jnp.asarray([80.0] * 4))
        sel, sc, valid = (np.asarray(a) for a in (sel, sc, valid))
        direct = []
        for ci in range(sel.shape[1]):
            for k in np.nonzero(valid[0, ci])[0]:
                direct.append((ci, float(sc[0, ci, k])))
        got = [(d["class_id"], d["score"]) for d in out["detections"]]
        assert sorted(got) == pytest.approx(sorted(direct), rel=1e-5)
    finally:
        state.stop.set()
        httpd.shutdown()
        httpd.server_close()


def test_serve_dp_rejects_indivisible_batch(tmp_path):
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(6))
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    rc = serve.main(["--cfg", cfg_path, "--weights", wpath, "--port", "0",
                     "--batch", "3", "--dp", "2"])
    assert rc == 2


def test_submit_backpressure_bounded_queue():
    """The dispatcher queue is bounded: once full, submit() returns None
    immediately (the handler sends 503) instead of accumulating
    letterboxed canvases while waiters burn toward --timeout-s."""
    import argparse
    args = argparse.Namespace(batch=1, max_wait_ms=0.0, timeout_s=1.0,
                              verbose=False)
    # no dispatcher thread: nothing drains the queue
    state = serve.ServeState(spec=None, params=None, step=None,
                             names=["c"], args=args)
    canvas = np.zeros((4, 4, 3), np.uint8)
    cap = state.q.maxsize
    assert cap >= 16
    for _ in range(cap):
        assert state.submit(canvas, 4.0, 4.0) is not None
    # queue full now — immediate rejection, counted in stats
    assert state.submit(canvas, 4.0, 4.0) is None
    st = state.stats()
    assert st["rejected"] == 1 and st["requests"] == cap + 1
