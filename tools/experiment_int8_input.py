#!/usr/bin/env python
"""On-chip A/B: the INTEGER-DOMAIN INPUT STAGE (judge-round 3).

docs/PERF.md's op trace says the pruned pipeline is input-stage-bound:
conv1 (3->8 @416², 802 us) + maxpool1 (471 us) + letterbox matmul
(292 us) are ~34% of the 4.66 ms step, all HBM-bound. The source frames
are ALREADY uint8, yet the production path letterboxes in bf16 and keeps
the early convs bf16 (the requant epilogue historically cost more than
int8 saved there). The int8_input path instead:

  * letterbox emits an INT8 canvas directly (quantize_canvas fused into
    the resize epilogue — no float canvas in HBM, no separate quantize),
  * conv1 consumes the int8 canvas on the MXU (in_scale carries the /255
    and /127 folding), maxpool runs on int8 (half the 471 us stream),
  * requant epilogues chain int8 activations through any chosen prefix,
    then hand over to bf16 exactly at the configured boundary.

Configs measured per model (full fused pipeline, bench deployment
config, batch 64, same lie-proof fori_loop timing as bench.py):

  bf16          — plain FAST path
  auto:64       — current pruned production hybrid (float input)
  i8in+all      — int8 input + every conv int8
  i8in+first{K}+auto:64 — int8 input + first K convs int8 + deep auto:64
                  (early int8 island, bf16 middle, int8 deep)

Usage: python tools/experiment_int8_input.py  (TPU; one JSON line/row)
Each row is also appended to PERF_LEDGER.jsonl (note=exp-int8-input).
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
    import dataclasses

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
    from modelcompression_tpu.models.cfg import ConvLayer
    from modelcompression_tpu.utils import perf_ledger
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
    calib = [rng.uniform(0, 1, (8, 416, 416, 3)).astype(np.float32)]

    base_cfg = EvalConfig(batch_size=BATCH, conf_thresh=0.01,
                          max_detections=32, nms_prefilter=128)

    def resolve_sel(spec_, mode):
        """mode -> (int8 conv-id list or None(=all) or 'off', int8_input)."""
        conv_ids = [i for i, l in enumerate(spec_.layers)
                    if isinstance(l, ConvLayer)]
        if mode == "bf16":
            return "off", False
        i8in = mode.startswith("i8in+")
        m = mode[5:] if i8in else mode
        if m == "all":
            return None, i8in
        if m.startswith("auto:"):
            return int8_layers_auto(spec_,
                                    min_channels=int(m.split(":")[1])), i8in
        # firstK+auto:J
        first, auto = m.split("+")
        k = int(first[5:])
        sel = sorted(set(conv_ids[:k]) | set(int8_layers_auto(
            spec_, min_channels=int(auto.split(":")[1]))))
        return sel, i8in

    def bench(spec_, params_, label, modes):
        folded = fold_batchnorm(params_, spec_)
        for mode in modes:
            sel, i8in = resolve_sel(spec_, mode)
            if sel == "off":
                cfg, p = base_cfg, folded
            else:
                p = quantize_from_batches(folded, spec_, calib,
                                          int8_layers=sel)
                cfg = dataclasses.replace(
                    base_cfg, int8_input=i8in,
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
            if isinstance(sel, list):
                row["n_int8_convs"] = len(sel)
            print(json.dumps(row), flush=True)
            perf_ledger.append({"mode": f"exp:{label}/{mode}",
                                "note": "exp-int8-input",
                                "img_per_sec": row["img_per_sec"],
                                "rtt_ms": round(rtt * 1e3, 1)})

    bench(slim_spec, slim_params, "pruned75",
          ["bf16", "auto:64", "i8in+all", "i8in+first1+auto:64",
           "i8in+first3+auto:64", "i8in+first5+auto:64"])
    bench(spec, params, "unpruned", ["all", "i8in+all"])


if __name__ == "__main__":
    main()
