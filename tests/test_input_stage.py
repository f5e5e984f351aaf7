"""Fused input-stage tests (ops/input_stage.py): the space-to-depth
phase-matmul reformulation of conv1+bias+leaky+maxpool must equal the
plain conv+pool at bf16 tolerance, in both the XLA-twin and Pallas
(interpret-mode) implementations, for the unpruned (C=32), tiny (C=16),
and pruned (C=8) filter counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.core.precision import FAST
from modelcompression_tpu.models.cfg import ConvLayer, MaxPoolLayer
from modelcompression_tpu.models.darknet import _activate, _conv, maxpool
from modelcompression_tpu.ops.input_stage import (
    fused_conv1_pool_pallas, fused_conv1_pool_xla, input_stage_match,
    s2d_weights, _tap_matrix,
)


def _reference(x, w, b):
    """What forward_folded does today: conv(3x3,s1,p1) + bias + leaky +
    maxpool(2,2) in FAST (bf16) precision."""
    layer = ConvLayer(filters=w.shape[3], size=3, stride=1, pad=1,
                      in_channels=3, batch_normalize=False,
                      activation="leaky")
    y = _conv(x, w, layer, FAST)
    y = y + b.astype(y.dtype)
    y = _activate(y, "leaky")
    return maxpool(y, MaxPoolLayer(size=2, stride=2))


def _rand_case(c_out, h=32, w=64, b=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    wgt = jnp.asarray(
        rng.normal(0, 0.2, (3, 3, 3, c_out)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.5, (c_out,)).astype(np.float32))
    return x, wgt, bias


def _assert_close(got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = np.abs(want).max() + 1e-6
    # bf16 has ~3 decimal digits; both sides round differently
    np.testing.assert_allclose(got, want, atol=0.03 * scale, rtol=0.05)


def test_tap_matrix_structure():
    m = _tap_matrix()
    assert m.shape == (108, 4, 3, 3, 3)
    # every conv tap maps to exactly one patch lane per phase
    assert m.sum() == 4 * 27
    assert (m.reshape(108, 4, 27).sum(axis=0) == 1).all()
    # each phase uses exactly 27 of the 108 lanes
    assert ((m.reshape(108, 4, 27).sum(axis=2) <= 1).all())


@pytest.mark.parametrize("c_out", [8, 16, 32])
def test_xla_twin_equals_conv_pool(c_out):
    x, w, b = _rand_case(c_out, seed=c_out)
    want = _reference(x, w, b)
    got = fused_conv1_pool_xla(x, w, b)
    assert got.shape == want.shape == (2, 16, 32, c_out)
    _assert_close(got, want)


@pytest.mark.parametrize("c_out", [8, 32])
def test_pallas_interpret_equals_xla_twin(c_out):
    x, w, b = _rand_case(c_out, h=64, w=64, b=3, seed=10 + c_out)
    want = fused_conv1_pool_xla(x, w, b)
    got = fused_conv1_pool_pallas(x, w, b, tile_h=16, interpret=True)
    _assert_close(got, want)


def test_pallas_ragged_fallback():
    # H/2 not divisible by tile_h -> silently uses the XLA twin
    x, w, b = _rand_case(8, h=24, w=32, seed=3)
    got = fused_conv1_pool_pallas(x, w, b, tile_h=16, interpret=True)
    _assert_close(got, fused_conv1_pool_xla(x, w, b))


def test_input_stage_match_on_zoo_specs():
    from modelcompression_tpu.models.zoo import tiny_yolov2_voc, yolov2_voc
    assert input_stage_match(yolov2_voc())
    assert input_stage_match(tiny_yolov2_voc())


def test_forward_folded_fused_matches_unfused():
    """Full-graph check: forward_folded(fuse_input_stage=True) equals the
    plain path at bf16 tolerance on Tiny-YOLOv2 (the raw detection map
    feeds decode, so tolerance is what matters downstream)."""
    from modelcompression_tpu.models import (
        fold_batchnorm, forward_folded, init_params,
    )
    from modelcompression_tpu.models.zoo import tiny_yolov2_voc
    spec = tiny_yolov2_voc()
    spec.net.width = spec.net.height = 64
    params = fold_batchnorm(init_params(spec, jax.random.key(0)), spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    want = forward_folded(params, x, spec, FAST)
    got = forward_folded(params, x, spec, FAST, fuse_input_stage=True)
    assert got.shape == want.shape
    _assert_close(got, want)


def test_s2d_weights_shape():
    w = jnp.ones((3, 3, 3, 16))
    ws = s2d_weights(w)
    assert ws.shape == (108, 64)
    # each output column holds exactly the 27 taps of one (phase, filter)
    assert float(jnp.sum(ws != 0) / 64) == 27.0
