"""One-off: can the input stage (normalize + conv1) be cheaper?
Variants measured on the repacked 75%-pruned YOLOv2, batch 64 @416.

A: current   x = u8->f32 /255 -> (bf16 cast inside conv) -> full model
B: fold      x = u8->bf16 raw; conv1 weights pre-scaled by 1/255
C: B + bf16 normalize only at input stage prefix (sanity: numerics)
"""
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
from modelcompression_tpu.models.darknet import conv_key, forward_folded
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

k1 = conv_key(sspec.conv_indices()[0])
folded_scaled = dict(folded)
folded_scaled[k1] = dict(folded[k1], w=folded[k1]["w"] / 255.0)


@jax.jit
def variant_a(p, u8):
    x = u8.astype(jnp.float32) / 255.0
    return forward_folded(p, x, sspec, FAST)


@jax.jit
def variant_b(p, u8):
    x = u8.astype(jnp.bfloat16)  # raw 0..255; conv1 absorbs the /255
    return forward_folded(p, x, sspec, FAST)


# salt perturbs the input so every timed call has distinct args
# (utils/timing.py: the tunnel can serve repeat executes memoized)
ta = time_fn(lambda salt: variant_a(folded, images + salt.astype(jnp.uint8)),
             iters=30, windows=3, rtt=rtt)
tb = time_fn(lambda salt: variant_b(folded_scaled,
                                    images + salt.astype(jnp.uint8)),
             iters=30, windows=3, rtt=rtt)
print(f"A current fwd : {ta*1e3:.2f} ms ({B/ta:.0f} img/s)")
print(f"B folded  fwd : {tb*1e3:.2f} ms ({B/tb:.0f} img/s)")

# numerics: compare final feature maps
ya = variant_a(folded, images)
yb = variant_b(folded_scaled, images)
d = jnp.max(jnp.abs(ya - yb)) / (jnp.max(jnp.abs(ya)) + 1e-9)
print(f"max rel diff A vs B: {float(d):.2e}")
