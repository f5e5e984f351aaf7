#!/usr/bin/env python
"""Headline benchmark (BASELINE.json:2,11): batch-64 streaming inference —
fused normalize + YOLOv2-416 forward + region decode + per-class NMS as one
XLA program — on the 75%-filter-pruned (physically repacked) model, on one
TPU chip.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": <pruned img/s/chip>, "unit": "img/s",
   "vs_baseline": <pruned / unpruned speedup>}

"vs_baseline" is the speedup over the unpruned YOLOv2 measured the same way
in the same run (the de-facto baseline per SURVEY.md §6 — the reference
published no numbers, BASELINE.json:13). The build target is >= 3.0
(BASELINE.json:5). All progress goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    # NOTE: the persistent compilation cache is deliberately NOT enabled —
    # it hangs the remote-compile TPU tunnel in this environment (see
    # cli/common.enable_compilation_cache).

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from modelcompression_tpu.compress import (
        repack, uniform_filter_fraction_keep_sets,
    )
    from modelcompression_tpu.core.precision import FAST
    from modelcompression_tpu.evaluation.decode import (
        center_to_corners, decode_region,
    )
    from modelcompression_tpu.evaluation.nms import batched_per_class_nms
    from modelcompression_tpu.models import (
        fold_batchnorm, forward_folded, init_params, num_params, yolov2_voc,
    )

    BATCH = 64
    WARMUP = 3
    ITERS = 15
    PRUNE_FRACTION = 0.75

    log(f"devices: {jax.devices()}")
    spec = yolov2_voc()
    region = spec.region
    rng = np.random.default_rng(0)

    log("initializing YOLOv2-VOC params...")
    params = init_params(spec, jax.random.key(0))
    log(f"params: {num_params(params) / 1e6:.1f}M")

    keep = uniform_filter_fraction_keep_sets(spec, params, PRUNE_FRACTION)
    slim_spec, slim_params = repack(spec, params, keep)
    log(f"75%-filter repacked params: {num_params(slim_params) / 1e6:.1f}M")

    def make_stream_step(spec_):
        def step(p, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            raw = forward_folded(p, x, spec_, FAST)
            boxes, obj, cls = decode_region(raw, region)
            scores = obj[..., None] * cls
            return batched_per_class_nms(
                center_to_corners(boxes), scores,
                iou_thresh=0.45, score_thresh=0.01, max_out=100)
        return jax.jit(step)

    images = jnp.asarray(rng.integers(
        0, 255, (BATCH, spec.net.height, spec.net.width, 3), np.uint8))

    def bench(spec_, params_, name):
        folded = fold_batchnorm(params_, spec_)
        step = make_stream_step(spec_)
        t0 = time.time()
        out = step(folded, images)
        jax.block_until_ready(out)
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        for _ in range(WARMUP - 1):
            out = step(folded, images)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = step(folded, images)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        ips = BATCH * ITERS / dt
        log(f"{name}: {ips:.1f} img/s ({dt / ITERS * 1e3:.1f} ms/batch)")
        return ips

    unpruned_ips = bench(spec, params, "unpruned")
    pruned_ips = bench(slim_spec, slim_params, "75%-filter-pruned")
    speedup = pruned_ips / unpruned_ips
    log(f"speedup: {speedup:.2f}x (target >= 3.0, BASELINE.json:5)")

    print(json.dumps({
        "metric": "yolov2_416 75%-filter-pruned streaming inference "
                  "(fused infer+decode+NMS, batch 64)",
        "value": round(pruned_ips, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(speedup, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
