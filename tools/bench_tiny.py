"""Secondary bench: Tiny-YOLOv2 (the iterative-loop model family,
BASELINE.json:10) through the same fused pipeline as bench.py — now a
DEPLOYMENT-CONFIG sweep (VERDICT r2 #8): Tiny is fixed-cost-bound (7
GF/img), so its best serving point is set by the NMS/prefilter/batch/int8
knobs, not by FLOPs. Sweeps the knobs that moved the full-YOLOv2 headline
and prints one row per config; the winning row is recorded in docs/PERF.md
("Tiny-YOLOv2" section).

Usage: python tools/bench_tiny.py [--configs name,name,...]
Each config is one 20-50 s remote compile; the default list is ~6.
"""
import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from modelcompression_tpu.compress import (
    forward_quantized, int8_layers_auto, quantize_from_batches, repack,
    uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
from modelcompression_tpu.models import (
    fold_batchnorm, init_params, num_conv_flops, tiny_yolov2_voc,
)
from modelcompression_tpu.utils.timing import measure_rtt, time_fn

SRC = (384, 512)
INNER = 10  # pipeline steps per dispatch (dispatch-proof, as bench.py)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--configs", default=None,
                    help="comma list; default: the standard sweep")
    args = ap.parse_args()

    spec = tiny_yolov2_voc()
    params = init_params(spec, jax.random.key(0))
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
    sspec, sparams = repack(spec, params, keep)
    rng = np.random.default_rng(0)
    calib = [rng.uniform(0, 1, (8, 416, 416, 3)).astype(np.float32)]
    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.0f} ms | src {SRC} | inner {INNER}",
          file=sys.stderr)

    base = EvalConfig(batch_size=64, conf_thresh=0.01, max_detections=32)

    # (name, spec/params pair, batch, cfg overrides, int8_layers)
    # int8_layers: "off" = bf16; None = all convs; list = hybrid subset
    CONFIGS = {
        "unpruned_b64":  (spec, params, 64, {}, "off"),
        "pruned_b64":    (sspec, sparams, 64, {}, "off"),
        "pruned_b64_pf128": (sspec, sparams, 64, dict(nms_prefilter=128),
                             "off"),
        "pruned_b64_pf64": (sspec, sparams, 64, dict(nms_prefilter=64),
                            "off"),
        "pruned_b64_pf128_int8auto": (
            sspec, sparams, 64, dict(nms_prefilter=128), "auto"),
        "pruned_b128_pf128": (sspec, sparams, 128, dict(nms_prefilter=128),
                              "off"),
        "pruned_b128_pf128_int8auto": (
            sspec, sparams, 128, dict(nms_prefilter=128), "auto"),
    }
    names = (args.configs.split(",") if args.configs
             else list(CONFIGS))

    dev = jax.devices()[0]
    results = {}
    for name in names:
        sp, pr, b, over, int8 = CONFIGS[name.strip()]
        cfg = dataclasses.replace(base, batch_size=b, **over)
        folded = fold_batchnorm(pr, sp)
        if int8 != "off":
            layers = (int8_layers_auto(sp, min_channels=64)
                      if int8 == "auto" else int8)
            folded = quantize_from_batches(folded, sp, calib,
                                           int8_layers=layers)
            cfg = dataclasses.replace(
                cfg, forward_fn=lambda q, x, s: forward_quantized(q, x, s))
        images = jax.device_put(jnp.asarray(
            rng.integers(0, 255, (b, *SRC, 3), np.uint8)), dev)
        img_w = jnp.full((b,), float(SRC[1]))
        img_h = jnp.full((b,), float(SRC[0]))
        folded = jax.device_put(folded, dev)
        step = make_eval_step(sp, cfg, src_hw=SRC)

        @jax.jit
        def many(p, u8, w_, h_, salt, step=step):
            def body(i, acc):
                u8_i = u8 + (i % 2).astype(jnp.uint8)  # defeat CSE
                boxes, scores, valid, *_ = step(p, u8_i, w_, h_)
                return acc + jnp.sum(scores)
            # salt carry init: distinct args per timed call, so the tunnel
            # cannot serve repeat executes memoized (utils/timing.py)
            return jax.lax.fori_loop(0, INNER, body, salt)

        t0 = time.time()
        jax.block_until_ready(many(folded, images, img_w, img_h,
                                   jnp.float32(0)))
        compile_s = time.time() - t0
        sec = time_fn(lambda salt: many(folded, images, img_w, img_h, salt),
                      iters=10, windows=3, rtt=rtt) / INNER
        gf = num_conv_flops(sp) / 1e9
        results[name] = b / sec
        print(f"{name:28s}: {b / sec:8.0f} img/s ({sec * 1e3:6.2f} ms/batch,"
              f" {gf:5.2f} GF/img, {gf * b / sec / 1e3:5.1f} TFLOPS;"
              f" compile {compile_s:.0f}s)")

    if results:
        best = max(results, key=results.get)
        print(f"best: {best} @ {results[best]:.0f} img/s")


if __name__ == "__main__":
    main()
