#!/usr/bin/env python
"""On-chip A/B: NMS class-agnostic prefilter 'topk' (per-image lax.top_k
sort) vs 'bisect' (batched segmented bit-bisection + cumsum-scatter
compaction, evaluation/nms.batched_bisect_prefilter) — VERDICT r3 #1: the
top-k sort was the largest un-attacked op left in the pruned step's trace
(sort.1, 693 us of 4.66 ms with the prefilter off).

Times the FULL fused pruned pipeline at bench.py's deployment config
(75%-filter-repacked YOLOv2, batch 64, conf 0.01, K=32, prefilter 128),
both bf16 and the int8-hybrid headline config, INTERLEAVED A/B/A/B in one
tunnel window (variance policy, docs/PERF.md). Lie-proof methodology:
INNER fori_loop per dispatch, salted carry, RTT-compensated
min-over-windows (utils/timing.py).
"""

import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from modelcompression_tpu.compress import (
        forward_quantized, int8_layers_auto, quantize_from_batches, repack,
        uniform_filter_fraction_keep_sets,
    )
    from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
    from modelcompression_tpu.models import (
        fold_batchnorm, init_params, yolov2_voc,
    )
    from modelcompression_tpu.utils.timing import (
        measure_rtt, salted_pipeline_loop, time_fn,
    )

    BATCH = 64
    SRC_H, SRC_W = 384, 512
    INNER = 10

    print(f"devices: {jax.devices()}", file=sys.stderr)
    spec = yolov2_voc()
    rng = np.random.default_rng(0)
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        params_host = init_params(spec, jax.random.key(0))
    params = jax.device_put(jax.tree.map(np.asarray, params_host),
                            jax.devices()[0])
    jax.block_until_ready(params)
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
    slim_spec, slim_params = repack(spec, params, keep)
    folded = fold_batchnorm(slim_params, slim_spec)
    calib = [rng.uniform(0, 1, (8, 416, 416, 3)).astype(np.float32)]
    qparams = quantize_from_batches(
        fold_batchnorm(slim_params, slim_spec), slim_spec, calib,
        int8_layers=int8_layers_auto(slim_spec, min_channels=64))

    img_w = jnp.full((BATCH,), float(SRC_W))
    img_h = jnp.full((BATCH,), float(SRC_H))
    images = jnp.asarray(rng.integers(
        0, 255, (BATCH, SRC_H, SRC_W, 3), np.uint8))
    rtt = measure_rtt()
    print(f"tunnel rtt: {rtt * 1e3:.0f} ms", file=sys.stderr)

    base_cfg = EvalConfig(batch_size=BATCH, conf_thresh=0.01,
                          max_detections=32, nms_prefilter=128)

    # build + compile all four programs first, then interleave the
    # timed windows A/B/A/B so both impls share congestion state
    progs = {}
    for fam, (p_, fwd) in (("bf16", (folded, None)),
                           ("int8auto64", (qparams, forward_quantized))):
        for impl in ("topk", "bisect"):
            cfg = dataclasses.replace(
                base_cfg, nms_prefilter_impl=impl,
                forward_fn=(None if fwd is None
                            else (lambda q, x, s: fwd(q, x, s))))
            step = make_eval_step(slim_spec, cfg, src_hw=(SRC_H, SRC_W))
            many = salted_pipeline_loop(step, INNER)
            t0 = time.time()
            out = step(p_, images, img_w, img_h)
            jax.block_until_ready(out)
            n_det = int(np.asarray(out[2]).sum())
            jax.block_until_ready(many(p_, images, img_w, img_h,
                                       jnp.float32(0)))
            print(f"{fam}/{impl}: compile+first {time.time() - t0:.1f}s "
                  f"(dets={n_det})", file=sys.stderr)
            progs[(fam, impl)] = (many, p_, n_det)

    # detections must agree between impls within the budget regime
    for fam in ("bf16", "int8auto64"):
        a, b = progs[(fam, "topk")][2], progs[(fam, "bisect")][2]
        print(f"{fam}: dets topk={a} bisect={b}", file=sys.stderr)

    results = {k: [] for k in progs}
    for rep in range(2):  # A/B/A/B interleave
        for key, (many, p_, _) in progs.items():
            sec = time_fn(
                lambda salt, many=many, p_=p_: many(p_, images, img_w,
                                                    img_h, salt),
                iters=10, windows=2, rtt=rtt) / INNER
            results[key].append(sec)
            print(f"rep{rep} {key[0]}/{key[1]}: {sec * 1e3:.2f} ms/batch "
                  f"({BATCH / sec:,.0f} img/s)")

    print("\n== min over interleaved reps ==")
    for fam in ("bf16", "int8auto64"):
        st = min(results[(fam, "topk")])
        sb = min(results[(fam, "bisect")])
        print(f"{fam}: topk {st * 1e3:.2f} ms ({BATCH / st:,.0f} img/s)  "
              f"bisect {sb * 1e3:.2f} ms ({BATCH / sb:,.0f} img/s)  "
              f"bisect/topk speedup {st / sb:.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
