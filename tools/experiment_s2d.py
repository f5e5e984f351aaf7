"""One-off: space-to-depth rewrite of the YOLOv2 input stage.

conv1 (3x3, stride 1, pad 1, Cin=3) + maxpool(2,2) is exactly expressible
as: space-to-depth(2) -> conv 3x3 over 12 channels producing 4*O phase
outputs -> max over the 4 phases -> (+bias, leaky). The padded-matmul
footprint shrinks ~4x (K 27->108 both pad to 128, but M drops 4x and N
packs 4 phases into one lane block).
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
from modelcompression_tpu.models.cfg import NetworkSpec
from modelcompression_tpu.models.darknet import (
    _activate, conv_key, forward_folded,
)
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
w1 = np.asarray(folded[k1]["w"], np.float32)   # (3,3,3,O)
b1 = np.asarray(folded[k1]["bias"], np.float32)
O = w1.shape[3]

# build s2d kernel (3,3,12,4*O)
w_s2d = np.zeros((3, 3, 12, 4 * O), np.float32)
for rp_o in (0, 1):
    for cp_o in (0, 1):
        po = rp_o * 2 + cp_o
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                di = (rp_o + dy) // 2 + 1      # -1..1 -> 0..2
                rp = (rp_o + dy) % 2
                dj = (cp_o + dx) // 2 + 1
                cp = (cp_o + dx) % 2
                for c in range(3):
                    w_s2d[di, dj, rp * 6 + cp * 3 + c, po * O:(po + 1) * O] \
                        += w1[dy + 1, dx + 1, c, :]
w_s2d_j = jnp.asarray(w_s2d)
b1_j = jnp.asarray(b1)


def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def input_stage_s2d(u8):
    x = u8.astype(jnp.float32) / 255.0
    x = s2d(x).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        x, w_s2d_j.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 4, O).max(axis=3)
    return _activate(y + b1_j.astype(y.dtype), "leaky")


def input_stage_ref(u8):
    x = (u8.astype(jnp.float32) / 255.0)
    sub = NetworkSpec(net=sspec.net, layers=sspec.layers[:2])
    return forward_folded(folded, x, sub, FAST)


rest_spec = NetworkSpec(net=sspec.net, layers=sspec.layers[2:])
# forward_folded indexes params by ABSOLUTE layer idx; build shifted params
shift = {}
for i, l in enumerate(sspec.layers[2:]):
    from modelcompression_tpu.models.cfg import ConvLayer
    if isinstance(l, ConvLayer):
        shift[conv_key(i)] = folded[conv_key(i + 2)]
# route/reorg indices inside rest_spec reference absolute layer numbers —
# shift them too
from modelcompression_tpu.models.cfg import RouteLayer
import dataclasses
rest_layers = []
for l in rest_spec.layers:
    if isinstance(l, RouteLayer):
        l = dataclasses.replace(l, layers=tuple(a - 2 for a in l.layers))
    rest_layers.append(l)
rest_spec = NetworkSpec(net=sspec.net, layers=rest_layers)


@jax.jit
def full_ref(u8):
    x = u8.astype(jnp.float32) / 255.0
    return forward_folded(folded, x, sspec, FAST)


@jax.jit
def full_s2d(u8):
    y = input_stage_s2d(u8)
    return forward_folded(shift, y, rest_spec, FAST)


@jax.jit
def stage_ref(u8):
    return input_stage_ref(u8)


@jax.jit
def stage_s2d(u8):
    return input_stage_s2d(u8)


# numerics first
ya = stage_ref(images)
yb = stage_s2d(images)
d = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
print(f"input stage max abs diff: {d:.2e} (bf16 tol)")

fa = full_ref(images)
fb = full_s2d(images)
rd = float(jnp.max(jnp.abs(fa - fb)) / (jnp.max(jnp.abs(fa)) + 1e-9))
print(f"full fwd max rel diff: {rd:.2e}")

# salted inputs: distinct args per timed call (utils/timing.py)
t_sr = time_fn(lambda salt: stage_ref(images + salt.astype(jnp.uint8)),
               iters=30, windows=3, rtt=rtt)
t_ss = time_fn(lambda salt: stage_s2d(images + salt.astype(jnp.uint8)),
               iters=30, windows=3, rtt=rtt)
t_fr = time_fn(lambda salt: full_ref(images + salt.astype(jnp.uint8)),
               iters=30, windows=3, rtt=rtt)
t_fs = time_fn(lambda salt: full_s2d(images + salt.astype(jnp.uint8)),
               iters=30, windows=3, rtt=rtt)
print(f"input stage: ref {t_sr*1e3:.2f} ms -> s2d {t_ss*1e3:.2f} ms")
print(f"full fwd   : ref {t_fr*1e3:.2f} ms -> s2d {t_fs*1e3:.2f} ms "
      f"({B/t_fs:.0f} img/s)")
