#!/usr/bin/env python
"""On-chip A/B: letterbox resize dtype (f32 vs the FAST conv bf16).

The FAST eval pipeline's conv stack consumes bf16, but the letterbox
matmuls historically ran in f32 — double the HBM traffic for an input
the first conv immediately rounds to bf16 anyway. This times the FULL
fused pruned pipeline (bench.py's deployment config) with the resize in
f32 vs bf16, by monkeypatching ``pipeline._resize_dtype`` for the
baseline arm. Lie-proof methodology (INNER fori_loop per dispatch,
salted carry, RTT-compensated min-over-windows; utils/timing.py).
Accept/reject recorded in docs/PERF.md's ledger.
"""

import os
import sys

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
    from modelcompression_tpu.evaluation import pipeline as pl
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

    cfg = EvalConfig(batch_size=BATCH, conf_thresh=0.01, max_detections=32,
                     nms_prefilter=128)
    orig_resize_dtype = pl._resize_dtype
    arms = {
        "f32 resize (old)": lambda p: jnp.float32,
        "bf16 resize (new)": orig_resize_dtype,
    }
    results = {}
    det_counts = {}
    for name, fn in arms.items():
        pl._resize_dtype = fn
        try:
            step = make_eval_step(slim_spec, cfg, src_hw=(SRC_H, SRC_W))
        finally:
            pl._resize_dtype = orig_resize_dtype
        out = step(folded, images, img_w, img_h)
        jax.block_until_ready(out)
        det_counts[name] = int(np.asarray(out[2]).sum())

        @functools.partial(jax.jit)
        def many(p, u8, w_, h_, salt, step=step):
            def body(i, acc):
                u8_i = u8 + (i % 2).astype(jnp.uint8)  # defeat CSE
                boxes, scores, valid, _, _ = step(p, u8_i, w_, h_)
                return acc + jnp.sum(scores)
            return jax.lax.fori_loop(0, INNER, body, salt)

        def timed(salt, many=many):
            return many(folded, images, img_w, img_h, salt)

        t = time_fn(timed, iters=3, warmup=1, rtt=rtt) / INNER
        results[name] = t
        print(f"{name}: {t * 1e3:.2f} ms/batch "
              f"({BATCH / t:.0f} img/s, {det_counts[name]} detections)",
              file=sys.stderr)

    base = results["f32 resize (old)"]
    new = results["bf16 resize (new)"]
    print(f"speedup: {base / new:.3f}x "
          f"(detections {det_counts['f32 resize (old)']} -> "
          f"{det_counts['bf16 resize (new)']})")


if __name__ == "__main__":
    main()
