#!/usr/bin/env python
"""On-chip A/B: the FULL fused eval pipeline (letterbox+infer+decode+NMS,
bench deployment config, batch 64) with bf16 vs int8 vs hybrid forwards.

The per-layer A/B (tools/experiment_int8.py) showed int8 wins ~1.7x where
the MXU is the wall but loses on the HBM-bound early convs. This measures
what that nets out to END TO END for the unpruned YOLOv2-416 and the
75%-filter-pruned model, across int8 layer selections:

  bf16      — the production FAST path (bench.py's number)
  int8:all  — every conv quantized (eval --int8 default)
  int8:auto:K — convs with min(Cin,Cout) >= K (compress.int8_layers_auto)

Timing is the same lie-proof pattern as bench.py: INNER pipeline
iterations inside one fori_loop, salted carry, forced output read.

Usage: python tools/experiment_int8_e2e.py   (TPU; one JSON line per row)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
SRC_H, SRC_W = 384, 512
INNER = 10


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
    from modelcompression_tpu.utils.timing import measure_rtt, time_fn

    def log(m):
        print(m, file=sys.stderr, flush=True)

    spec = yolov2_voc()
    rng = np.random.default_rng(0)
    log("init params on host cpu...")
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        params_host = init_params(spec, jax.random.key(0))
    params = jax.device_put(jax.tree.map(np.asarray, params_host),
                            jax.devices()[0])
    jax.block_until_ready(params)
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
    slim_spec, slim_params = repack(spec, params, keep)

    rtt = measure_rtt()
    log(f"rtt {rtt*1e3:.0f} ms")

    img_w = jnp.full((BATCH,), float(SRC_W))
    img_h = jnp.full((BATCH,), float(SRC_H))
    images = jnp.asarray(rng.integers(
        0, 255, (BATCH, SRC_H, SRC_W, 3), np.uint8))
    # calibration batch in [0,1] at net resolution (random weights — the
    # scales just need to be sane, throughput doesn't care)
    calib = [rng.uniform(0, 1, (8, 416, 416, 3)).astype(np.float32)]

    def bench(spec_, params_, label, modes):
        folded = fold_batchnorm(params_, spec_)
        import functools
        for mode in modes:
            if mode == "bf16":
                cfg = EvalConfig(batch_size=BATCH, conf_thresh=0.01,
                                 max_detections=32, nms_prefilter=128)
                p = folded
            else:
                if mode == "all":
                    sel = None
                else:  # auto:K
                    sel = int8_layers_auto(spec_,
                                           min_channels=int(mode.split(":")[1]))
                    if not sel:
                        log(f"{label}/{mode}: empty selection, skip")
                        continue
                p = quantize_from_batches(folded, spec_, calib,
                                          int8_layers=sel)
                cfg = EvalConfig(
                    batch_size=BATCH, conf_thresh=0.01, max_detections=32,
                    nms_prefilter=128,
                    forward_fn=lambda q, x, s: forward_quantized(q, x, s))
            step = make_eval_step(spec_, cfg, src_hw=(SRC_H, SRC_W))
            t0 = time.time()
            jax.block_until_ready(step(p, images, img_w, img_h))
            log(f"{label}/{mode}: compile+first {time.time()-t0:.1f}s")

            @jax.jit
            def many(pp, u8, w_, h_, salt):
                def body(i, acc):
                    u8_i = u8 + (i % 2).astype(jnp.uint8)
                    _, scores, _, _, _ = step(pp, u8_i, w_, h_)
                    return acc + jnp.sum(scores)
                return jax.lax.fori_loop(0, INNER, body, salt)

            jax.block_until_ready(many(p, images, img_w, img_h,
                                       jnp.float32(0)))
            sec = time_fn(lambda salt: many(p, images, img_w, img_h, salt),
                          iters=10, windows=3, rtt=rtt) / INNER
            row = {"model": label, "mode": mode,
                   "ms_per_batch": round(sec * 1e3, 2),
                   "img_per_sec": round(BATCH / sec, 1)}
            if mode != "bf16" and sel is not None:
                row["n_int8_convs"] = len(sel)
            print(json.dumps(row), flush=True)

    bench(spec, params, "unpruned", ["bf16", "all", "auto:128", "auto:256"])
    bench(slim_spec, slim_params, "pruned75",
          ["bf16", "all", "auto:64", "auto:128"])


if __name__ == "__main__":
    main()
