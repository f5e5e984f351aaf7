"""Secondary bench: Tiny-YOLOv2 (the iterative-loop model family,
BASELINE.json:10) through the same fused pipeline as bench.py."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from modelcompression_tpu.compress import (
    repack, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
from modelcompression_tpu.models import (
    fold_batchnorm, init_params, num_conv_flops, tiny_yolov2_voc,
)
from modelcompression_tpu.utils.timing import measure_rtt, time_fn

B = 64
SRC = (384, 512)
spec = tiny_yolov2_voc()
params = init_params(spec, jax.random.key(0))
keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
sspec, sparams = repack(spec, params, keep)
cfg = EvalConfig(batch_size=B, conf_thresh=0.01, max_detections=32)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, *SRC, 3), np.uint8))
img_w = jnp.full((B,), float(SRC[1]))
img_h = jnp.full((B,), float(SRC[0]))
rtt = measure_rtt()
print(f"rtt {rtt*1e3:.0f} ms", file=sys.stderr)

INNER = 10  # pipeline steps per dispatch (dispatch-proof, as bench.py)

for name, sp, pr in (("tiny unpruned", spec, params),
                     ("tiny 75%-pruned", sspec, sparams)):
    folded = fold_batchnorm(pr, sp)
    step = make_eval_step(sp, cfg, src_hw=SRC)

    @jax.jit
    def many(p, u8, w_, h_, salt, step=step):
        def body(i, acc):
            u8_i = u8 + (i % 2).astype(jnp.uint8)  # defeat CSE
            boxes, scores, valid, _, _ = step(p, u8_i, w_, h_)
            return acc + jnp.sum(scores)
        # salt carry init: distinct args per timed call, so the tunnel
        # cannot serve repeat executes memoized (utils/timing.py)
        return jax.lax.fori_loop(0, INNER, body, salt)

    sec = time_fn(lambda salt: many(folded, images, img_w, img_h, salt),
                  iters=10, windows=3, rtt=rtt) / INNER
    gf = num_conv_flops(sp) / 1e9
    print(f"{name}: {B/sec:.0f} img/s ({sec*1e3:.2f} ms/batch, "
          f"{gf:.2f} GF/img, {gf*B/sec/1e3:.1f} TFLOPS)")
