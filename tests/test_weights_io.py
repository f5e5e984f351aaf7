"""Darknet .weights codec tests (SURVEY.md Appendix A.2): byte-exact
round-trip, header variants, OIHW layout faithfulness, truncation errors."""

import io

import jax
import numpy as np
import pytest

from modelcompression_tpu.models import (
    init_params, parse_cfg, tiny_yolov2_voc,
)
from modelcompression_tpu.models.weights_io import (
    load_weights, roundtrip_bytes, save_weights,
)
from modelcompression_tpu.models.darknet import conv_key


def _params_np(spec, seed=0):
    rng = np.random.default_rng(seed)
    params = jax.tree.map(np.asarray, init_params(spec, jax.random.key(seed)))
    return jax.tree.map(
        lambda v: rng.standard_normal(v.shape).astype(np.float32), params)


def test_roundtrip_exact():
    spec = tiny_yolov2_voc()
    params = _params_np(spec)
    blob = roundtrip_bytes(spec, params, seen=1234)
    loaded, seen = load_weights(io.BytesIO(blob), spec)
    assert seen == 1234
    for k, p in params.items():
        for name, v in p.items():
            np.testing.assert_array_equal(loaded[k][name], v)


def test_header_int32_seen():
    spec = tiny_yolov2_voc()
    params = _params_np(spec)
    b = io.BytesIO()
    save_weights(b, spec, params, seen=7, major=0, minor=1)
    blob = b.getvalue()
    # 3 int32 header + int32 seen
    assert np.frombuffer(blob[:16], np.int32).tolist() == [0, 1, 0, 7]
    loaded, seen = load_weights(io.BytesIO(blob), spec)
    assert seen == 7
    np.testing.assert_array_equal(loaded[conv_key(0)]["w"],
                                  params[conv_key(0)]["w"])


def test_header_int64_seen():
    spec = tiny_yolov2_voc()
    params = _params_np(spec)
    blob = roundtrip_bytes(spec, params, seen=2**33)
    _, seen = load_weights(io.BytesIO(blob), spec)
    assert seen == 2**33


def test_layout_oihw_order():
    """First conv: bytes after BN stats must be OIHW-ordered weights."""
    cfg = """
[net]
width=8
height=8
channels=2
[convolutional]
batch_normalize=1
filters=3
size=3
stride=1
pad=1
activation=leaky
[region]
anchors=1,1
classes=1
num=1
"""
    spec = parse_cfg(cfg)
    params = _params_np(spec)
    blob = roundtrip_bytes(spec, params)
    floats = np.frombuffer(blob[20:], np.float32)  # skip 12B hdr + int64 seen
    bn = floats[:4 * 3]
    np.testing.assert_array_equal(bn[:3], params[conv_key(0)]["beta"])
    w_oihw = floats[4 * 3:].reshape(3, 2, 3, 3)
    np.testing.assert_array_equal(
        w_oihw, np.asarray(params[conv_key(0)]["w"]).transpose(3, 2, 0, 1))


def test_truncated_raises():
    spec = tiny_yolov2_voc()
    params = _params_np(spec)
    blob = roundtrip_bytes(spec, params)
    with pytest.raises(ValueError, match="truncated"):
        load_weights(io.BytesIO(blob[:-64]), spec)
    with pytest.raises(ValueError, match="trailing"):
        load_weights(io.BytesIO(blob + b"\x00" * 8), spec)
