#!/usr/bin/env python
"""Headline benchmark (BASELINE.json:2,11): batch-64 fused
letterbox+infer+decode+NMS on YOLOv2-416 — the evaluation pipeline's actual
jitted program (evaluation.make_eval_step, src_hw mode) — on the
75%-filter-pruned (physically repacked) model vs the unpruned model, on one
TPU chip.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": <pruned img/s/chip>, "unit": "img/s/chip",
   "vs_baseline": <pruned / unpruned speedup>, ...extra diagnostics}

``--quick [pruned|unpruned|pruned_int8|unpruned_int8]`` measures ONE
configuration (default: the pruned-bf16 headline pipeline) with one
compile — ~1 min wall vs ~15 for the full run — for per-commit
regression checks and experiment A/Bs. Every invocation (full or quick)
appends its numbers to ``PERF_LEDGER.jsonl`` stamped with timestamp +
git commit (utils/perf_ledger.py; SURVEY.md §4.7 "images/sec/chip
recorded per commit"); ``--note`` tags an entry so adopt/reject
decisions can cite ≥2 ledger runs (docs/PERF.md "Measurement
variance").

"vs_baseline" is the speedup over the unpruned bf16 YOLOv2 measured the
same way in the same run (the de-facto baseline per SURVEY.md §6 — the
reference published no numbers, BASELINE.json:13). The build target is
>= 3.0 (BASELINE.json:5).

The full run is SELF-CHECKING (VERDICT r4 Weak #1): exit status is
nonzero when any gated section (int8 hybrid, b128 serving point, the
tiny3/v4tiny/v4full family rows) fails — the failure reasons appear
under "skipped" in the JSON — or when vs_baseline lands below the 3.0
contract. Sections still run independently so one broken family cannot
hide the others' numbers. "value" is the best COMPRESSED deployment
config of the run — pruning alone, or pruning composed with the int8
hybrid (compress/quantize.py) when that measures faster; both components
are always reported separately (pruned_bf16_img_per_sec /
pruned_int8_img_per_sec) so the axes stay comparable across rounds.

Two measurements, both honest about what they are:

* value / vs_baseline — CHIP throughput of the fused program with
  device-resident input (what "images/sec/chip" means). Timed with
  RTT-compensated min-over-windows (utils/timing.py): this environment's
  TPU sits behind a network tunnel whose round-trip latency is volatile
  (40–400 ms), and naive timing windows carry one RTT of noise each.
* streaming_img_per_sec — end-to-end with FRESH host batches transferred
  inside the timed loop (unique buffers each iteration so the tunnel's
  content-dedupe cannot cheat), double-buffered by async dispatch. On this
  tunnel the feed tops out at ~1.5 GB/s (feed_gbps is measured and
  reported) — ~0.4 ms/img of transfer, which is the bound for BOTH models
  here; on a real TPU host PCIe moves the same batch in ~2 ms and the chip
  numbers dominate. All progress goes to stderr.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


QUICK_CONFIGS = ("pruned", "unpruned", "pruned_int8", "unpruned_int8",
                 "tiny3", "v4tiny", "v4full")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--quick", nargs="?", const="pruned",
                   choices=QUICK_CONFIGS, default=None,
                   help="measure ONE configuration (one compile, ~1 min "
                        "wall): per-commit regression checks and "
                        "experiment A/Bs (default config: pruned). "
                        "'tiny3' = the YOLOv3 family's deployment config "
                        "(yolov3-tiny-voc 75%%-pruned + pf128 + int8 "
                        "auto:64) so v3-path regressions are "
                        "commit-attributable (VERDICT r3 #3)")
    p.add_argument("--note", default="",
                   help="free-form tag recorded in PERF_LEDGER.jsonl "
                        "(e.g. the experiment an A/B run belongs to)")
    p.add_argument("--no-ledger", action="store_true",
                   help="skip the PERF_LEDGER.jsonl append")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    # NOTE: the persistent compilation cache is deliberately NOT enabled —
    # it hangs the remote-compile TPU tunnel in this environment (see
    # cli/common.enable_compilation_cache).

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from modelcompression_tpu.compress import (
        forward_quantized, int8_layers_auto, quantize_from_batches, repack,
        uniform_filter_fraction_keep_sets,
    )
    from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
    from modelcompression_tpu.models import (
        fold_batchnorm, init_params, num_conv_flops, num_params, yolov2_voc,
    )
    from modelcompression_tpu.utils import perf_ledger
    from modelcompression_tpu.utils.timing import measure_rtt, time_fn

    PEAK_BF16_TFLOPS = 197.0  # TPU v5 lite (v5e) chip peak, bf16

    BATCH = 64
    SRC_H, SRC_W = 384, 512      # VOC-ish source frames, letterboxed on device
    PRUNE_FRACTION = 0.75
    STREAM_ITERS = 24

    log(f"devices: {jax.devices()}")
    spec = yolov2_voc()
    rng = np.random.default_rng(0)
    cpu0 = jax.devices("cpu")[0]
    tpu0 = jax.devices()[0]

    def setup_yolov2():
        """(params, slim_spec, slim_params) for the headline family."""
        log("initializing YOLOv2-VOC params (on host CPU)...")
        t0 = time.time()
        # init on the CPU backend: 23 per-layer RNG programs over the
        # tunnel take minutes; one 200MB bulk transfer takes seconds
        with jax.default_device(cpu0):
            params_host = init_params(spec, jax.random.key(0))
        params = jax.device_put(jax.tree.map(np.asarray, params_host), tpu0)
        jax.block_until_ready(params)
        log(f"params: {num_params(params) / 1e6:.1f}M "
            f"({time.time() - t0:.1f}s)")
        keep = uniform_filter_fraction_keep_sets(spec, params,
                                                 PRUNE_FRACTION)
        slim_spec, slim_params = repack(spec, params, keep)
        log(f"75%-filter repacked params: "
            f"{num_params(slim_params) / 1e6:.1f}M")
        return params, slim_spec, slim_params

    def setup_v4tiny():
        """The third family's deployment model: yolov4-tiny-voc
        75%-filter-pruned (CSP sources split-balanced — the uniform-path
        default; best measured config pairs pf128 + int8 auto:64,
        docs/PERF.md 'YOLOv4-tiny family')."""
        from modelcompression_tpu.models import yolov4_tiny_voc
        v4 = yolov4_tiny_voc()
        with jax.default_device(cpu0):
            p4_host = init_params(v4, jax.random.key(3))
            keep4 = uniform_filter_fraction_keep_sets(v4, p4_host,
                                                      PRUNE_FRACTION)
            slim4, p4s_host = repack(v4, p4_host, keep4)
        p4s = jax.device_put(jax.tree.map(np.asarray, p4s_host), tpu0)
        jax.block_until_ready(p4s)
        log(f"v4tiny 75%-filter repacked params: "
            f"{num_params(p4s) / 1e6:.1f}M")
        return slim4, p4s

    def setup_v4full():
        """The FOURTH family's deployment model: full yolov4-voc (64M
        params, CSPDarknet53+SPP+PAN) 75%-filter-pruned with
        --tied group (the 5 CSP residual trunks slimmed — the measured
        deployment mode, docs/PERF.md 'Full YOLOv4'). Prune/repack on
        host CPU so only the ~4M-param slimmed tree crosses the
        tunnel."""
        from modelcompression_tpu.models import yolov4_voc
        v4f = yolov4_voc()
        with jax.default_device(cpu0):
            pf_host = init_params(v4f, jax.random.key(4))
            keepf = uniform_filter_fraction_keep_sets(v4f, pf_host,
                                                      PRUNE_FRACTION,
                                                      tied="group")
            slimf, pf_s_host = repack(v4f, pf_host, keepf)
        pf_s = jax.device_put(jax.tree.map(np.asarray, pf_s_host), tpu0)
        jax.block_until_ready(pf_s)
        log(f"v4full 75%-tied repacked params: "
            f"{num_params(pf_s) / 1e6:.1f}M")
        return slimf, pf_s

    def setup_tiny3():
        """The second detector family's deployment model: yolov3-tiny-voc
        75%-filter-pruned (its measured-best serving point pairs this
        with nms_prefilter=128 + int8 auto:64 — docs/PERF.md 'YOLOv3
        family'). Prune/repack on host CPU, one bulk transfer."""
        from modelcompression_tpu.models import yolov3_tiny_voc
        t3 = yolov3_tiny_voc()
        with jax.default_device(cpu0):
            p3_host = init_params(t3, jax.random.key(2))
            keep3 = uniform_filter_fraction_keep_sets(t3, p3_host,
                                                      PRUNE_FRACTION)
            slim3, p3s_host = repack(t3, p3_host, keep3)
        p3s = jax.device_put(jax.tree.map(np.asarray, p3s_host), tpu0)
        jax.block_until_ready(p3s)
        log(f"tiny3 75%-filter repacked params: "
            f"{num_params(p3s) / 1e6:.1f}M")
        return slim3, p3s

    # deployment eval config: conf 0.01, 32 dets/class/image (a 13x13 VOC
    # scene rarely yields more; the mAP eval path keeps 0.005/100 and no
    # prefilter). nms_prefilter=128: one class-agnostic top-128 before
    # the 20 per-class sorts — measured +10% on the pruned pipeline
    # (docs/PERF.md "NMS class-agnostic prefilter"), exact while <= 128
    # candidates on an image have ANY class above conf (reported via the
    # eval step's per-image n_any counter; evaluate() compares it to the
    # budget and reports prefilter_overflow_frac).
    cfg = EvalConfig(batch_size=BATCH, conf_thresh=0.01, max_detections=32,
                     nms_prefilter=128)
    img_w = jnp.full((BATCH,), float(SRC_W))
    img_h = jnp.full((BATCH,), float(SRC_H))
    images = jnp.asarray(rng.integers(
        0, 255, (BATCH, SRC_H, SRC_W, 3), np.uint8))

    rtt = measure_rtt()
    log(f"tunnel rtt: {rtt * 1e3:.0f} ms")

    INNER = 10  # pipeline steps per dispatch (see note below)

    # int8 calibration batch (random weights — the scales just need to be
    # sane; throughput does not depend on them)
    calib = [rng.uniform(0, 1, (8, 416, 416, 3)).astype(np.float32)]

    def bench_chip(spec_, params_, name, int8_layers="off"):
        """int8_layers: 'off' = bf16 FAST path; None = every conv int8;
        a list = hybrid (compress.quantize)."""
        folded = fold_batchnorm(params_, spec_)
        if int8_layers == "off":
            cfg_ = cfg
        else:
            folded = quantize_from_batches(folded, spec_, calib,
                                           int8_layers=int8_layers)
            cfg_ = dataclasses.replace(
                cfg, forward_fn=lambda q, x, s: forward_quantized(q, x, s))
        step = make_eval_step(spec_, cfg_, src_hw=(SRC_H, SRC_W))
        t0 = time.time()
        jax.block_until_ready(step(folded, images, img_w, img_h))
        log(f"{name}: compile+first {time.time() - t0:.1f}s")

        # chip-throughput measurement: the shared lie-proof inner loop
        # (utils/timing.salted_pipeline_loop — INNER iterations per
        # dispatch, CSE-defeating input perturbation, full-scores carry,
        # salted init; rationale in its docstring)
        from modelcompression_tpu.utils.timing import salted_pipeline_loop
        many = salted_pipeline_loop(step, INNER)
        jax.block_until_ready(many(folded, images, img_w, img_h,
                                   jnp.float32(0)))
        sec = time_fn(lambda salt: many(folded, images, img_w, img_h, salt),
                      iters=10, windows=3, rtt=rtt) / INNER
        ips = BATCH / sec
        tflops = num_conv_flops(spec_) * ips / 1e12
        log(f"{name}: {ips:.1f} img/s ({sec * 1e3:.2f} ms/batch, "
            f"{tflops:.1f} TFLOPS = {tflops / PEAK_BF16_TFLOPS:.0%} MFU)")
        return ips, folded, step

    if args.quick:
        # ONE configuration, one compile (~1 min wall): the per-commit
        # regression / experiment-A/B mode. vs_baseline is null — no
        # in-run baseline is measured; compare ledger entries instead.
        if args.quick in ("tiny3", "v4tiny", "v4full"):
            qspec, qparams = {"tiny3": setup_tiny3,
                              "v4tiny": setup_v4tiny,
                              "v4full": setup_v4full}[args.quick]()
            # v4full's measured-best deployment point is bf16 (int8
            # measured slower at these shapes — docs/PERF.md)
            int8 = ("off" if args.quick == "v4full"
                    else int8_layers_auto(qspec, min_channels=64))
        else:
            params, slim_spec, slim_params = setup_yolov2()
            qspec, qparams = ((slim_spec, slim_params)
                              if args.quick.startswith("pruned")
                              else (spec, params))
            int8 = "off"
            if args.quick.endswith("int8"):
                int8 = (int8_layers_auto(slim_spec, min_channels=64)
                        if args.quick == "pruned_int8" else None)
        label = {"pruned": "75%-filter-pruned",
                 "unpruned": "unpruned",
                 "pruned_int8": "75%-pruned+int8(auto:64)",
                 "unpruned_int8": "unpruned+int8",
                 "tiny3": "tiny3 75%-pruned+pf128+int8(auto:64)",
                 "v4tiny": "v4tiny 75%-pruned+pf128+int8(auto:64)",
                 "v4full": "v4full 75%-tied-pruned+pf128"
                 }[args.quick]
        ips, _, _ = bench_chip(qspec, qparams, label, int8_layers=int8)
        if not args.no_ledger:
            entry = perf_ledger.append({
                "mode": f"quick:{args.quick}", "note": args.note,
                "img_per_sec": round(ips, 1),
                "rtt_ms": round(rtt * 1e3, 1)})
            log(f"ledger: {entry['commit']} {entry['mode']} "
                f"{entry['img_per_sec']} img/s")
        family = {"tiny3": "yolov3_tiny_416",
                  "v4tiny": "yolov4_tiny_416",
                  "v4full": "yolov4_416"}.get(args.quick, "yolov2_416")
        print(json.dumps({
            "metric": f"{family} {label} fused "
                      "letterbox+infer+decode+NMS, batch 64 (quick)",
            "value": round(ips, 1),
            "unit": "img/s/chip",
            "vs_baseline": None,
            "quick": args.quick,
            "tunnel_rtt_ms": round(rtt * 1e3, 1),
        }))
        return 0

    params, slim_spec, slim_params = setup_yolov2()
    # per-round gate (VERDICT r4 Weak #1): the family/serving sections
    # below still run best-effort so one broken family cannot hide the
    # others' numbers, but every failure is RECORDED and makes the run
    # exit nonzero with an explicit "skipped" map in the JSON — absence
    # of a gate field is a loud failure, not a buried [warn] line.
    gate_skipped = {}
    unpruned_ips, _, _ = bench_chip(spec, params, "unpruned")
    pruned_ips, folded, step = bench_chip(slim_spec, slim_params,
                                          "75%-filter-pruned")

    # the second compression axis (compress/quantize.py), measured in the
    # same run: full int8 on the unpruned model (every conv — measured
    # fastest end-to-end, docs/PERF.md "Int8 e2e"), hybrid auto:64 on the
    # pruned model (early convs stay bf16: int8 loses where HBM is the
    # wall). Gated: a failure is recorded and fails the run (rc=1).
    unpruned_int8_ips = pruned_int8_ips = None
    try:
        unpruned_int8_ips, _, _ = bench_chip(
            spec, params, "unpruned+int8", int8_layers=None)
        pruned_int8_ips, _, _ = bench_chip(
            slim_spec, slim_params, "75%-pruned+int8(auto:64)",
            int8_layers=int8_layers_auto(slim_spec, min_channels=64))
    except Exception as e:
        gate_skipped["pruned_int8_img_per_sec"] = str(e)
        log(f"[gate] int8 measurement FAILED: {e}")

    # the BEST SERVING POINT (capacity planning, docs/PERF.md "Batch
    # scaling"): the same deployment config at batch 128 — measured
    # 1.5x the batch-64 point (24.3k img/s r4 sweep). The headline
    # value stays the BASELINE.json:11 batch-64 config; this field
    # tracks the peak the serving surfaces (--batch 128) can reach.
    # Gated: a failure is recorded and fails the run (rc=1).
    pruned_b128_ips = None
    try:
        cfg128 = dataclasses.replace(cfg, batch_size=128)
        q128 = quantize_from_batches(
            fold_batchnorm(slim_params, slim_spec), slim_spec, calib,
            int8_layers=int8_layers_auto(slim_spec, min_channels=64))
        step128 = make_eval_step(slim_spec, dataclasses.replace(
            cfg128, forward_fn=lambda q, x, s: forward_quantized(q, x, s)),
            src_hw=(SRC_H, SRC_W))
        img128 = jnp.asarray(rng.integers(
            0, 255, (128, SRC_H, SRC_W, 3), np.uint8))
        w128 = jnp.full((128,), float(SRC_W))
        h128 = jnp.full((128,), float(SRC_H))
        t0 = time.time()
        jax.block_until_ready(step128(q128, img128, w128, h128))
        log(f"b128 serving point: compile+first {time.time() - t0:.1f}s")
        from modelcompression_tpu.utils.timing import salted_pipeline_loop
        many128 = salted_pipeline_loop(step128, INNER)
        jax.block_until_ready(many128(q128, img128, w128, h128,
                                      jnp.float32(0)))
        sec = time_fn(lambda salt: many128(q128, img128, w128, h128, salt),
                      iters=6, windows=3, rtt=rtt) / INNER
        pruned_b128_ips = 128 / sec
        log(f"75%-pruned+int8(auto:64) batch 128 (best serving point): "
            f"{pruned_b128_ips:.1f} img/s ({sec * 1e3:.2f} ms/batch)")
    except Exception as e:
        gate_skipped["pruned_b128_img_per_sec"] = str(e)
        log(f"[gate] b128 serving-point measurement FAILED: {e}")

    # the SECOND detector family in the per-round gate (VERDICT r3 #3):
    # yolov3-tiny's deployment config through the same fused pipeline, so
    # a regression in shortcut/upsample/multi-head decode shows up in
    # BENCH_r*.json and the ledger. Gated: failure -> rc=1.
    tiny3_ips = None
    try:
        slim3, p3s = setup_tiny3()
        tiny3_ips, _, _ = bench_chip(
            slim3, p3s, "tiny3 75%-pruned+pf128+int8(auto:64)",
            int8_layers=int8_layers_auto(slim3, min_channels=64))
    except Exception as e:
        gate_skipped["tiny3_img_per_sec"] = str(e)
        log(f"[gate] tiny3 measurement FAILED: {e}")

    # the THIRD family (yolov4-tiny) in the gate too: CSP grouped-route
    # splits + split-balanced pruning are the round-4 machinery a
    # regression would hit. Gated: failure -> rc=1.
    v4tiny_ips = None
    try:
        slim4, p4s = setup_v4tiny()
        v4tiny_ips, _, _ = bench_chip(
            slim4, p4s, "v4tiny 75%-pruned+pf128+int8(auto:64)",
            int8_layers=int8_layers_auto(slim4, min_channels=64))
    except Exception as e:
        gate_skipped["v4tiny_img_per_sec"] = str(e)
        log(f"[gate] v4tiny measurement FAILED: {e}")

    # the FOURTH family (full yolov4, round 5): CSPDarknet53+SPP+PAN
    # with tied-group pruning of the 5 CSP residual trunks — the graph
    # a PAN/route/shortcut/mish regression would hit. Gated: rc=1.
    v4full_ips = None
    try:
        slimf, pfs = setup_v4full()
        v4full_ips, _, _ = bench_chip(
            slimf, pfs, "v4full 75%-tied-pruned+pf128")
    except Exception as e:
        gate_skipped["v4full_img_per_sec"] = str(e)
        log(f"[gate] v4full measurement FAILED: {e}")

    # optional: BENCH_TRACE_DIR=<path> captures a jax.profiler trace of the
    # pruned fused step (perfetto/tensorboard format) for MFU forensics
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(10):
                out = step(folded, images, img_w, img_h)
            jax.block_until_ready(out)
        log(f"profiler trace written to {trace_dir}")
    # headline = the best COMPRESSED deployment config this framework
    # offers (pruning alone, or pruning + the int8 hybrid when that
    # measures faster in this run), against the unpruned bf16 baseline
    # measured the same way. The pruning-only speedup is reported
    # alongside so the two axes stay separable across rounds.
    best_ips = pruned_ips
    best_label = "75%-filter-pruned"
    if pruned_int8_ips and pruned_int8_ips > best_ips:
        best_ips = pruned_int8_ips
        best_label = "75%-filter-pruned + int8 hybrid (auto:64)"
    speedup = best_ips / unpruned_ips
    log(f"chip speedup ({best_label}): {speedup:.2f}x "
        f"(pruning alone: {pruned_ips / unpruned_ips:.2f}x; "
        f"target >= 3.0, BASELINE.json:5)")

    # --- honest streaming: fresh host batches, transfer in the timed loop ---
    # probe batches and timed batches are DISJOINT so the tunnel's
    # content-dedupe can't serve any timed transfer from cache
    probe = [rng.integers(0, 255, (BATCH, SRC_H, SRC_W, 3), np.uint8)
             for _ in range(12)]
    batches = [rng.integers(0, 255, (BATCH, SRC_H, SRC_W, 3), np.uint8)
               for _ in range(STREAM_ITERS)]
    nbytes = batches[0].nbytes
    # feed-only bandwidth (pipelined puts of unique data). A read (not
    # just a block) forces completion: block_until_ready can resolve
    # before the bytes land under the tunnel's async mode
    # (utils/timing.py docstring). Reading only the LAST buffer suffices
    # — the puts share one link, so its completion bounds the window —
    # and avoids adding 7 serial round-trips to the timed section.
    def force(arrs):
        jax.block_until_ready(arrs)
        jax.device_get(arrs[-1].ravel()[0])
    xs = [jax.device_put(b) for b in probe[:4]]
    force(xs)
    t0 = time.perf_counter()
    xs = [jax.device_put(b) for b in probe[4:12]]
    force(xs)
    feed_gbps = 8 * nbytes / 1e9 / (time.perf_counter() - t0)
    del xs
    log(f"feed bandwidth (unique 36MB puts): {feed_gbps:.2f} GB/s")

    outs = []
    t0 = time.perf_counter()
    for b in batches:
        x = jax.device_put(b)
        outs.append(step(folded, x, img_w, img_h))
    jax.block_until_ready(outs)
    # chip execution is serial, so reading one scalar from the LAST step's
    # output forces every enqueued step (block alone can resolve early)
    jax.device_get(outs[-1][1].ravel()[0])
    dt = time.perf_counter() - t0
    stream_ips = BATCH * STREAM_ITERS / dt
    log(f"streaming (host feed in loop): {stream_ips:.1f} img/s "
        f"({dt / STREAM_ITERS * 1e3:.1f} ms/batch, "
        f"{nbytes / 1e6:.0f} MB/batch over the tunnel)")

    # --- fine-tune throughput at the slimmed model's real speed ----------
    # (the iterative loop's training cost, BASELINE.json:9,10). Best-effort:
    # never fails the bench gate.
    train_ips = None
    try:
        from modelcompression_tpu.train import (
            TrainConfig, TrainState, make_optimizer, make_train_step,
        )
        # subdivisions=1: measure ONE fwd+bwd at batch 64 (the chip-speed
        # number); the cfg-faithful accumulated step is the same program
        # scanned 8x (tests/test_subdivisions.py pins its semantics)
        tcfg = TrainConfig.from_spec(slim_spec, augment_flip=True,
                                     augment_jitter=0.0, subdivisions=1,
                                     max_boxes=30)
        tx = make_optimizer(tcfg)
        tstate = TrainState.create(slim_params, tx, jax.random.key(1))
        tstep = make_train_step(slim_spec, tcfg, tx)
        timgs = jnp.asarray(rng.integers(
            0, 255, (BATCH, 416, 416, 3), np.uint8))
        tg = np.zeros((BATCH, 30, 5), np.float32)
        tg[:, 0] = [0, 0.5, 0.5, 0.3, 0.3]
        tg = jnp.asarray(tg)
        holder = {"s": tstate}

        def one_train_step():
            s, m = tstep(holder["s"], timgs, tg)  # donates prior state
            holder["s"] = s
            return m["loss"]

        sec = time_fn(one_train_step, iters=30, windows=3, rtt=rtt)
        train_ips = BATCH / sec
        log(f"75%-pruned fine-tune step: {train_ips:.1f} img/s "
            f"({sec * 1e3:.2f} ms/step, fwd+bwd+SGD+BN, batch {BATCH})")
    except Exception as e:
        log(f"[warn] train throughput measurement skipped: {e}")

    # frozen-backbone variant (finetune --freeze 1): conv1's dW/pool-VJP/
    # BN backward are the training twin of the input-stage wall, and
    # freezing the first conv drops them at compile time (docs/PERF.md
    # "--freeze N"). Best-effort, never fails the gate.
    train_freeze_ips = None
    try:
        fcfg = dataclasses.replace(tcfg, freeze_prefix=1)
        ftx = make_optimizer(fcfg)
        fstate = TrainState.create(slim_params, ftx, jax.random.key(2))
        fstep = make_train_step(slim_spec, fcfg, ftx)
        fholder = {"s": fstate}

        def one_freeze_step():
            s, m = fstep(fholder["s"], timgs, tg)
            fholder["s"] = s
            return m["loss"]

        sec = time_fn(one_freeze_step, iters=30, windows=3, rtt=rtt)
        train_freeze_ips = BATCH / sec
        log(f"75%-pruned fine-tune step, --freeze 1: "
            f"{train_freeze_ips:.1f} img/s ({sec * 1e3:.2f} ms/step)")
    except Exception as e:
        log(f"[warn] freeze train measurement skipped: {e}")

    # --- Pallas-vs-XLA equality on the real chip, re-proven every round ---
    # XLA side = the PRODUCTION default (compress/backend.py 'fused': the
    # one-program segmented bisection); the per-shape argsort 'reference'
    # backend stays a CPU oracle — running it here would pay one remote
    # compile per conv shape (ops/topk_mask.py:5-8).
    from modelcompression_tpu.compress import magnitude_mask_fn
    from modelcompression_tpu.ops.pallas_topk import (
        pallas_magnitude_masks_perlayer,
    )
    t0 = time.perf_counter()
    masks_pl = pallas_magnitude_masks_perlayer(params, spec, 0.75)
    masks_pl = {k: np.asarray(v) for k, v in masks_pl.items()}
    pallas_secs = time.perf_counter() - t0
    t0 = time.perf_counter()
    masks_xla = magnitude_mask_fn("magnitude")(params, spec, 0.75)
    masks_xla = {k: np.asarray(v) for k, v in masks_xla.items()}
    fused_secs = time.perf_counter() - t0
    log(f"fused (production default) mask path: {fused_secs:.2f}s "
        f"incl. compile")
    pallas_equal = all(
        bool((masks_pl[k] == masks_xla[k]).all())
        for k in masks_xla)
    log(f"pallas top-k/mask == XLA on hardware: {pallas_equal} "
        f"({pallas_secs:.2f}s incl. compile, "
        f"{sum(m.size for m in masks_pl.values()) / 1e6:.1f}M weights)")

    if not args.no_ledger:
        entry = perf_ledger.append({
            "mode": "full", "note": args.note,
            "img_per_sec": round(best_ips, 1),
            "best_label": best_label,
            "vs_baseline": round(speedup, 3),
            "unpruned_img_per_sec": round(unpruned_ips, 1),
            "pruned_bf16_img_per_sec": round(pruned_ips, 1),
            "pruned_int8_img_per_sec":
                round(pruned_int8_ips, 1) if pruned_int8_ips else None,
            "tiny3_img_per_sec":
                round(tiny3_ips, 1) if tiny3_ips else None,
            "v4tiny_img_per_sec":
                round(v4tiny_ips, 1) if v4tiny_ips else None,
            "v4full_img_per_sec":
                round(v4full_ips, 1) if v4full_ips else None,
            "pruned_b128_img_per_sec":
                round(pruned_b128_ips, 1) if pruned_b128_ips else None,
            "streaming_img_per_sec": round(stream_ips, 1),
            "pruned_finetune_img_per_sec":
                round(train_ips, 1) if train_ips else None,
            "pruned_finetune_freeze1_img_per_sec":
                round(train_freeze_ips, 1) if train_freeze_ips else None,
            "rtt_ms": round(rtt * 1e3, 1)})
        log(f"ledger: {entry['commit']} full {entry['img_per_sec']} img/s")

    print(json.dumps({
        "metric": f"yolov2_416 {best_label} fused "
                  "letterbox+infer+decode+NMS, batch 64",
        "value": round(best_ips, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(speedup, 3),
        "unpruned_img_per_sec": round(unpruned_ips, 1),
        "pruned_bf16_img_per_sec": round(pruned_ips, 1),
        "pruned_int8_img_per_sec":
            round(pruned_int8_ips, 1) if pruned_int8_ips else None,
        "unpruned_int8_img_per_sec":
            round(unpruned_int8_ips, 1) if unpruned_int8_ips else None,
        "tiny3_img_per_sec":
            round(tiny3_ips, 1) if tiny3_ips else None,
        "v4tiny_img_per_sec":
            round(v4tiny_ips, 1) if v4tiny_ips else None,
        "v4full_img_per_sec":
            round(v4full_ips, 1) if v4full_ips else None,
        "pruned_b128_img_per_sec":
            round(pruned_b128_ips, 1) if pruned_b128_ips else None,
        "streaming_img_per_sec": round(stream_ips, 1),
        "feed_gbps": round(feed_gbps, 2),
        "tunnel_rtt_ms": round(rtt * 1e3, 1),
        "pallas_equal_xla": pallas_equal,
        "pruned_finetune_img_per_sec":
            round(train_ips, 1) if train_ips else None,
        "pruned_finetune_freeze1_img_per_sec":
            round(train_freeze_ips, 1) if train_freeze_ips else None,
        **({"skipped": gate_skipped} if gate_skipped else {}),
    }))
    # self-checking contract (VERDICT r4 Weak #1): the >= 3.0 speedup
    # target (BASELINE.json:5) and the per-family gate fields are
    # asserted here, so a regression that crashes a family setup or
    # erodes the headline makes the whole bench exit nonzero — the
    # driver and the ledger both see it.
    rc = 0
    if gate_skipped:
        log(f"[gate] FAILED sections: {sorted(gate_skipped)}")
        rc = 1
    if speedup < 3.0:
        log(f"[gate] vs_baseline {speedup:.2f} < 3.0 "
            "(BASELINE.json:5 contract)")
        rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
