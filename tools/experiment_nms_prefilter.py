#!/usr/bin/env python
"""On-chip A/B of the class-agnostic NMS prefilter (VERDICT r1 #8).

Times the FULL fused pruned pipeline (bench.py's exact deployment config:
75%-filter-repacked YOLOv2, batch 64, conf 0.01, K=32) with
EvalConfig.nms_prefilter in {0 (off), 128, 256} — lie-proof methodology
(INNER fori_loop per dispatch, salted carry, RTT-compensated
min-over-windows; utils/timing.py). Results go into docs/PERF.md's
explored ledger; accept/reject is decided by these numbers.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from modelcompression_tpu.compress import (
        repack, uniform_filter_fraction_keep_sets,
    )
    from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
    from modelcompression_tpu.models import (
        fold_batchnorm, init_params, yolov2_voc,
    )
    from modelcompression_tpu.utils.timing import measure_rtt, time_fn

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

    img_w = jnp.full((BATCH,), float(SRC_W))
    img_h = jnp.full((BATCH,), float(SRC_H))
    images = jnp.asarray(rng.integers(
        0, 255, (BATCH, SRC_H, SRC_W, 3), np.uint8))
    rtt = measure_rtt()
    print(f"tunnel rtt: {rtt * 1e3:.0f} ms", file=sys.stderr)

    base_cfg = EvalConfig(batch_size=BATCH, conf_thresh=0.01,
                          max_detections=32)
    results = {}
    for npre in (0, 64, 128, 256):
        cfg = dataclasses.replace(base_cfg, nms_prefilter=npre)
        step = make_eval_step(slim_spec, cfg, src_hw=(SRC_H, SRC_W))
        t0 = time.time()
        out = step(folded, images, img_w, img_h)
        jax.block_until_ready(out)
        print(f"prefilter={npre}: compile+first {time.time() - t0:.1f}s",
              file=sys.stderr)
        # functional check on-chip: detections identical to the
        # unfiltered path on this (random-weights, overflowing!) input is
        # NOT expected beyond the budget — compare detection counts only
        n_det = int(np.asarray(out[2]).sum())
        n_cand_max = int(np.asarray(out[3]).max())
        n_any_max = int(np.asarray(out[4]).max())
        print(f"prefilter={npre}: worst any-class candidate count "
              f"{n_any_max} (exactness budget when prefilter is on)",
              file=sys.stderr)

        from modelcompression_tpu.utils.timing import salted_pipeline_loop
        many = salted_pipeline_loop(step, INNER)

        jax.block_until_ready(many(folded, images, img_w, img_h,
                                   jnp.float32(0)))
        sec = time_fn(lambda salt: many(folded, images, img_w, img_h, salt),
                      iters=10, windows=3, rtt=rtt) / INNER
        ips = BATCH / sec
        results[npre] = (sec, ips, n_det, n_cand_max)
        print(f"prefilter={npre:>4}: {sec * 1e3:.2f} ms/batch "
              f"{ips:,.0f} img/s  (dets={n_det}, worst n_cand="
              f"{n_cand_max})")

    base = results[0][1]
    for npre, (sec, ips, _, _) in results.items():
        if npre:
            print(f"prefilter={npre}: {ips / base:.3f}x vs off")
    return 0


if __name__ == "__main__":
    sys.exit(main())
