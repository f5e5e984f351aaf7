"""Quantization-aware fine-tuning (compress/qat.py): the STE primitive,
exact correspondence of the QAT training forward to the deployed int8
program, and composition with the train step's masks/hybrid subsets."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.compress import (
    QATSpec, fake_quant, fake_quant_weight, qat_spec_from_batches,
    quantize_qat,
)
from modelcompression_tpu.compress.quantize import forward_quantized
from modelcompression_tpu.core import BITMATCH
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.models.darknet import conv_key
from modelcompression_tpu.train.train_step import _forward_train

# a no-BN cfg: without BN the training forward IS the deployed graph
# (conv + bias + leaky), so QAT-vs-int8 correspondence is testable
# exactly rather than modulo batch-vs-running statistics. Includes a
# route concat so the scale-group boundary logic is exercised.
NO_BN_CFG = """
[net]
batch=2
subdivisions=1
width=64
height=64
channels=3
learning_rate=0.001

[convolutional]
batch_normalize=0
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=0
filters=16
size=3
stride=2
pad=1
activation=leaky

[route]
layers=-1

[convolutional]
batch_normalize=0
filters=40
size=1
stride=1
pad=0
activation=linear

[region]
anchors = 1.0,1.0, 2.0,2.0
bias_match=1
classes=3
coords=4
num=2
softmax=1
jitter=0.0
rescore=1
object_scale=5
noobject_scale=1
class_scale=1
coord_scale=1
absolute=1
thresh=0.6
"""


def test_fake_quant_values_and_ste_gradient():
    """Forward = clip(round(x/s))*s; backward = identity (the STE)."""
    x = jnp.asarray([-300.0, -1.27, -0.004, 0.0, 0.004, 0.01, 1.0, 300.0])
    s = 0.01
    got = fake_quant(x, s)
    want = np.clip(np.round(np.asarray(x) / s), -127, 127) * s
    # the STE identity form x + stop_grad(q - x) re-adds x, so the value
    # carries one f32 cancellation rounding at |x|'s ulp
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=3e-5)

    g = jax.grad(lambda t: jnp.sum(fake_quant(t, s) * 3.0))(x)
    np.testing.assert_array_equal(np.asarray(g), np.full(x.shape, 3.0))

    # per-channel weight grid: max|w| per out channel / 127, identity grad
    w = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3, 4, 5))
                    .astype(np.float32))
    qw = np.asarray(fake_quant_weight(w))
    s_c = np.abs(np.asarray(w)).reshape(-1, 5).max(axis=0) / 127.0
    np.testing.assert_allclose(qw, np.round(np.asarray(w) / s_c) * s_c,
                               rtol=0, atol=1e-6)
    gw = jax.grad(lambda t: jnp.sum(fake_quant_weight(t)))(w)
    np.testing.assert_array_equal(np.asarray(gw), np.ones(w.shape))


def _no_bn_setup(int8_layers=None):
    spec = parse_cfg(NO_BN_CFG)
    params = init_params(spec, jax.random.key(3))
    rng = np.random.default_rng(4)
    calib = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
    qat = qat_spec_from_batches(params, spec, calib,
                                int8_layers=int8_layers)
    x = jnp.asarray(calib[0])
    return spec, params, qat, x


def test_qat_forward_matches_deployed_int8():
    """On a BN-free net the QAT training forward (fake-quant, f32
    HIGHEST) must numerically match the deployed int8 program
    (integer convs) — same grids, same boundary placement; the only
    difference is f32-rounded vs int32-exact accumulation."""
    for sel in (None, [0], [2, 4]):  # all | first-conv island | suffix
        spec, params, qat, x = _no_bn_setup(int8_layers=sel)
        got, stats = _forward_train(params, x, spec, BITMATCH, {}, qat=qat)
        assert not stats  # no BN layers
        ref = np.asarray(forward_quantized(
            quantize_qat(params, spec, qat), x, spec, precision=BITMATCH))
        nrmse = (np.sqrt(np.mean((np.asarray(got) - ref) ** 2))
                 / (np.std(ref) + 1e-12))
        assert nrmse < 1e-3, (sel, nrmse)


def test_qat_spec_grids_match_export():
    """The exported int8 pytree carries EXACTLY the activation grids the
    QATSpec trained against (scale-group-merged), and the weight grids
    match fake_quant_weight's dynamic rule."""
    spec, params, qat, _ = _no_bn_setup()
    q = quantize_qat(params, spec, qat)
    assert float(q["__net__"]["input_scale"]) == np.float32(qat.in_scale[0])
    for i in sorted(qat.int8):
        p = q[conv_key(i)]
        assert float(p["in_scale"]) == np.float32(qat.in_scale[i]), i
        if i in qat.out_scale:
            assert float(p["out_scale"]) == np.float32(qat.out_scale[i]), i
        w = np.asarray(params[conv_key(i)]["w"], np.float32)
        s_c = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0),
                         1e-12) / 127.0
        np.testing.assert_allclose(np.asarray(p["s_w"]), s_c, rtol=1e-7)


def test_qat_train_step_composes_with_masks():
    """One jitted QAT train step on the BN fixture cfg: finite loss,
    weights move, pruned weights stay zero, and the QAT forward really
    engages (loss differs from the non-QAT step under identical PRNG)."""
    from modelcompression_tpu.train import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    rng = np.random.default_rng(5)
    calib = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
    qat = qat_spec_from_batches(params, spec, calib)
    assert isinstance(qat, QATSpec) and len(qat.int8) >= 3

    k = conv_key(0)
    mask = {k: jnp.asarray(
        rng.uniform(size=np.asarray(params[k]["w"]).shape) > 0.5)}
    imgs = jnp.asarray(rng.integers(0, 255, (4, 64, 64, 3), np.uint8))
    tgts = jnp.zeros((4, 8, 5), jnp.float32)
    tgts = tgts.at[:, 0].set(jnp.asarray([1.0, 0.5, 0.5, 0.4, 0.4]))

    losses = {}
    for name, q in (("qat", qat), ("plain", None)):
        cfg = TrainConfig.from_spec(spec, augment_flip=False,
                                    augment_jitter=0.0, max_boxes=8, qat=q)
        tx = make_optimizer(cfg)
        state = TrainState.create(params, tx, jax.random.key(7),
                                  weight_masks=mask)
        step = make_train_step(spec, cfg, tx)
        state, m = step(state, imgs, tgts)
        assert np.isfinite(float(m["loss"])), name
        w_new = np.asarray(state["params"][k]["w"])
        assert not np.array_equal(w_new, np.asarray(params[k]["w"]))
        assert np.all(w_new[~np.asarray(mask[k])] == 0.0), name
        losses[name] = float(m["loss"])
    assert losses["qat"] != losses["plain"], losses


def test_qat_rejects_non_conv_layers():
    spec = parse_cfg(NO_BN_CFG)
    params = init_params(spec, jax.random.key(0))
    calib = [np.zeros((1, 64, 64, 3), np.float32)]
    try:
        qat_spec_from_batches(params, spec, calib, int8_layers=[1])
    except ValueError as e:
        assert "not conv" in str(e)
    else:
        raise AssertionError("maxpool index accepted as int8 layer")
