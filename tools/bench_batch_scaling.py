"""Throughput vs batch size for the fused pipeline (capacity planning /
serving table in docs/PERF.md).

VERDICT r3 #2: the sweep takes the DEPLOYMENT knobs, so the table
reflects the production serving configuration rather than a bare
EvalConfig — `--prefilter 128` (NMS class-agnostic prefilter) and
`--int8 {off,all,auto:K}` (the PTQ hybrid) compose with every batch
point, and the sweep prints the best serving point per model.

Usage:
  python tools/bench_batch_scaling.py                       # bf16 sweep
  python tools/bench_batch_scaling.py --deployment          # the measured
      # production knobs: pf128 + int8 auto:64 on pruned / all on
      # unpruned (docs/PERF.md "Int8 e2e" regimes)
  python tools/bench_batch_scaling.py --batches 64,128 --models pruned
Each (model, batch) point is one 20-50 s remote compile.
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
from modelcompression_tpu.models import fold_batchnorm, init_params, yolov2_voc
from modelcompression_tpu.utils.timing import (
    measure_rtt, salted_pipeline_loop, time_fn,
)

INNER = 10  # pipeline steps per dispatch (dispatch-proof, as bench.py)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batches", default="8,16,64,128,256")
    p.add_argument("--models", default="unpruned,pruned")
    p.add_argument("--prefilter", type=int, default=0,
                   help="EvalConfig.nms_prefilter (deployment: 128)")
    p.add_argument("--int8", default="off",
                   help="'off', 'all', or 'auto:K' — int8 PTQ selector "
                        "applied to every swept model")
    p.add_argument("--deployment", action="store_true",
                   help="the measured production knobs: prefilter 128; "
                        "int8 auto:64 on the pruned model, all convs on "
                        "the unpruned (their measured-best regimes, "
                        "docs/PERF.md) — overrides --prefilter/--int8")
    return p.parse_args()


def main():
    args = parse_args()
    batches = [int(b) for b in args.batches.split(",") if b]
    models = [m.strip() for m in args.models.split(",") if m.strip()]

    spec = yolov2_voc()
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(spec, jax.random.key(0))
    params = jax.device_put(jax.tree.map(np.asarray, params),
                            jax.devices()[0])
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
    sspec, sparams = repack(spec, params, keep)
    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.0f} ms", file=sys.stderr)

    def resolve(name):
        sp, pr = (spec, params) if name == "unpruned" else (sspec, sparams)
        if args.deployment:
            pf = 128
            int8 = "auto:64" if name == "pruned" else "all"
        else:
            pf, int8 = args.prefilter, args.int8
        folded = fold_batchnorm(pr, sp)
        fwd = None
        if int8 != "off":
            sel = (None if int8 == "all" else
                   int8_layers_auto(sp, min_channels=int(int8.split(":")[1])))
            calib = [rng.uniform(0, 1, (8, 416, 416, 3)).astype(np.float32)]
            folded = quantize_from_batches(folded, sp, calib,
                                           int8_layers=sel)
            fwd = lambda q, x, s: forward_quantized(q, x, s)
        return sp, folded, pf, int8, fwd

    for name in models:
        sp, folded, pf, int8, fwd = resolve(name)
        tag = f"{name}[pf{pf},int8={int8}]"
        best = (0.0, None)
        for B in batches:
            cfg = EvalConfig(batch_size=B, conf_thresh=0.01,
                             max_detections=32, nms_prefilter=pf)
            if fwd is not None:
                cfg = dataclasses.replace(cfg, forward_fn=fwd)
            step = make_eval_step(sp, cfg, src_hw=(384, 512))
            imgs = jnp.asarray(rng.integers(0, 255, (B, 384, 512, 3),
                                            np.uint8))
            w = jnp.full((B,), 512.0)
            h = jnp.full((B,), 384.0)

            many = salted_pipeline_loop(step, INNER)
            t0 = time.time()
            jax.block_until_ready(many(folded, imgs, w, h, jnp.float32(0)))
            print(f"{tag} B={B}: compile+first {time.time() - t0:.1f}s",
                  file=sys.stderr)
            sec = time_fn(lambda salt: many(folded, imgs, w, h, salt),
                          iters=max(4, 256 // B), windows=3,
                          rtt=rtt) / INNER
            ips = B / sec
            if ips > best[0]:
                best = (ips, B)
            print(f"{tag} B={B:3d}: {ips:7.0f} img/s ({sec * 1e3:6.2f} ms)")
        print(f"{tag} BEST SERVING POINT: batch {best[1]} at "
              f"{best[0]:,.0f} img/s/chip")
    return 0


if __name__ == "__main__":
    sys.exit(main())
