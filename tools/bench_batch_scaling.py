"""Throughput vs batch size for the fused pipeline (capacity planning /
serving table in docs/PERF.md)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from modelcompression_tpu.compress import (
    repack, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
from modelcompression_tpu.models import fold_batchnorm, init_params, yolov2_voc
from modelcompression_tpu.utils.timing import measure_rtt, time_fn

spec = yolov2_voc()
with jax.default_device(jax.devices("cpu")[0]):
    params = init_params(spec, jax.random.key(0))
params = jax.device_put(jax.tree.map(np.asarray, params), jax.devices()[0])
keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
sspec, sparams = repack(spec, params, keep)
rng = np.random.default_rng(0)
rtt = measure_rtt()
print(f"rtt {rtt*1e3:.0f} ms", file=sys.stderr)

INNER = 10  # pipeline steps per dispatch (dispatch-proof, as bench.py)

for name, sp, pr in (("unpruned", spec, params),
                     ("75%-pruned", sspec, sparams)):
    folded = fold_batchnorm(pr, sp)
    for B in (8, 16, 64, 128, 256):
        cfg = EvalConfig(batch_size=B, conf_thresh=0.01, max_detections=32)
        step = make_eval_step(sp, cfg, src_hw=(384, 512))
        imgs = jnp.asarray(rng.integers(0, 255, (B, 384, 512, 3), np.uint8))
        w = jnp.full((B,), 512.0)
        h = jnp.full((B,), 384.0)

        @jax.jit
        def many(p, u8, w_, h_, salt, step=step):
            def body(i, acc):
                u8_i = u8 + (i % 2).astype(jnp.uint8)  # defeat CSE
                boxes, scores, valid, _, _ = step(p, u8_i, w_, h_)
                return acc + jnp.sum(scores)
            # salted carry: distinct args per call (utils/timing.py)
            return jax.lax.fori_loop(0, INNER, body, salt)

        sec = time_fn(lambda salt: many(folded, imgs, w, h, salt),
                      iters=max(4, 256 // B), windows=3, rtt=rtt) / INNER
        print(f"{name} B={B:3d}: {B/sec:7.0f} img/s ({sec*1e3:6.2f} ms)")
