"""One-off diagnostic: where does the model's forward time go?
Times forward passes through prefixes of the YOLOv2 layer stack (each
prefix is one remote compile, so the list is short). Default: the
75%-filter-pruned repacked model; pass --unpruned for the dense model
(the MFU-forensics artifact for the unpruned 49%-MFU headline row)."""
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
with jax.default_device(jax.devices("cpu")[0]):
    params_host = init_params(spec, jax.random.key(0))
params = jax.device_put(jax.tree.map(np.asarray, params_host),
                        jax.devices()[0])
if "--unpruned" in sys.argv:
    sspec, sparams = spec, params
else:
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
    sspec, sparams = repack(spec, params, keep)
folded = fold_batchnorm(sparams, sspec)
images = jnp.asarray(np.random.default_rng(0).integers(
    0, 255, (B, 416, 416, 3), np.uint8))
rtt = measure_rtt()
print(f"rtt {rtt*1e3:.0f} ms", file=sys.stderr)

# prefix cut points (layer indices, exclusive) — after selected convs/pools
cuts = [2, 6, 13, 18, 25, 31]
INNER = 20  # forward passes per dispatch: under tunnel congestion the
# per-execute dispatch latency exceeds small programs' runtime, so a
# per-dispatch measurement reads ~0 after RTT compensation; an on-device
# fori_loop makes the measurement dispatch-proof (same trick as bench.py)
prev = 0.0
for cut in cuts:
    sub = NetworkSpec(net=sspec.net, layers=sspec.layers[:cut])
    ch = [l.filters for l in sub.layers if isinstance(l, ConvLayer)]

    @jax.jit
    def many(p, u8, salt, sub=sub):
        def body(i, acc):
            u8_i = u8 + (i % 2).astype(jnp.uint8)  # defeat CSE
            y = forward_folded(p, u8_i.astype(jnp.float32) / 255.0, sub,
                               FAST)
            # consume ALL of y: reducing a slice would let XLA narrow the
            # batch/spatial dims through the entire conv chain (measured:
            # sum(y[0,0]) turns the whole prefix into a ~0ms program)
            return acc + jnp.sum(y.astype(jnp.float32))
        # salt as carry init: every timed call has distinct args, so the
        # tunnel cannot serve repeats memoized (utils/timing.py docstring)
        return jax.lax.fori_loop(0, INNER, body, salt)

    sec = time_fn(lambda salt: many(folded, images, salt), iters=5, windows=3,
                  rtt=rtt) / INNER
    gf = num_conv_flops(sub) / 1e9
    print(f"layers[:{cut:2d}] (convs {ch}): {sec*1e3:6.2f} ms "
          f"(+{(sec-prev)*1e3:5.2f})  {gf:5.2f} GF/img "
          f"-> {gf*B/sec/1e3:.1f} TFLOPS")
    prev = sec
