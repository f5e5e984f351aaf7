"""One-off diagnostic: where does the pruned model's forward time go?
Times forward passes through prefixes of the repacked YOLOv2 layer stack
(each prefix is one remote compile, so the list is short)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from modelcompression_tpu.compress import (
    repack, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.core.precision import FAST
from modelcompression_tpu.models import fold_batchnorm, init_params, yolov2_voc
from modelcompression_tpu.models.cfg import ConvLayer, NetworkSpec
from modelcompression_tpu.models.darknet import forward_folded, num_conv_flops
from modelcompression_tpu.utils.timing import measure_rtt, time_fn

B = 64
spec = yolov2_voc()
params = init_params(spec, jax.random.key(0))
keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
sspec, sparams = repack(spec, params, keep)
folded = fold_batchnorm(sparams, sspec)
images = jnp.asarray(np.random.default_rng(0).integers(
    0, 255, (B, 416, 416, 3), np.uint8))
rtt = measure_rtt()
print(f"rtt {rtt*1e3:.0f} ms", file=sys.stderr)

# prefix cut points (layer indices, exclusive) — after selected convs/pools
cuts = [2, 6, 13, 18, 25, 31]
prev = 0.0
for cut in cuts:
    sub = NetworkSpec(net=sspec.net, layers=sspec.layers[:cut])
    ch = [l.filters for l in sub.layers if isinstance(l, ConvLayer)]

    @jax.jit
    def f(p, u8, sub=sub):
        return forward_folded(p, u8.astype(jnp.float32) / 255.0, sub, FAST)

    sec = time_fn(lambda: f(folded, images), iters=30, windows=3, rtt=rtt)
    gf = num_conv_flops(sub) / 1e9
    print(f"layers[:{cut:2d}] (convs {ch}): {sec*1e3:6.2f} ms "
          f"(+{(sec-prev)*1e3:5.2f})  {gf:5.2f} GF/img "
          f"-> {gf*B/sec/1e3:.1f} TFLOPS")
    prev = sec
