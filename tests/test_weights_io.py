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


def test_partial_backbone_roundtrip():
    """Darknet's .conv.N convention: save the first N convs, load with
    partial=True — the prefix matches exactly, the suffix is absent, and a
    mid-layer truncation still raises."""
    spec = tiny_yolov2_voc()
    params = _params_np(spec)
    conv_idx = spec.conv_indices()
    n = 5

    b = io.BytesIO()
    save_weights(b, spec, params, seen=123, n_convs=n)
    buf = b.getvalue()

    loaded, seen = load_weights(io.BytesIO(buf), spec, partial=True)
    assert seen == 123
    assert len(loaded) == n
    for i in conv_idx[:n]:
        k = conv_key(i)
        for name, v in params[k].items():
            np.testing.assert_array_equal(loaded[k][name], v)
    for i in conv_idx[n:]:
        assert conv_key(i) not in loaded

    # without partial=True the same file is rejected as truncated
    with pytest.raises(ValueError, match="truncated"):
        load_weights(io.BytesIO(buf), spec)

    # a MID-layer cut (float-aligned) raises even with partial=True
    with pytest.raises(ValueError, match="MID-layer"):
        load_weights(io.BytesIO(buf[:-8]), spec, partial=True)


def test_partial_cli_init(tmp_path):
    """load_model --partial: covered convs from the file, the rest random."""
    import argparse
    from modelcompression_tpu.cli.common import load_model
    from modelcompression_tpu.models import dump_cfg

    spec = tiny_yolov2_voc()
    params = _params_np(spec)
    wpath = str(tmp_path / "backbone.conv.3")
    save_weights(wpath, spec, params, seen=999, n_convs=3)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))

    args = argparse.Namespace(cfg=cfg_path, weights=wpath, partial=True)
    spec2, loaded, seen = load_model(args)
    assert seen == 0  # training from a backbone restarts the counter
    conv_idx = spec2.conv_indices()
    for i in conv_idx[:3]:
        np.testing.assert_array_equal(loaded[conv_key(i)]["w"],
                                      params[conv_key(i)]["w"])
    # the rest exists (random init) and differs from the original params
    k_last = conv_key(conv_idx[-1])
    assert k_last in loaded
    assert not np.array_equal(loaded[k_last]["w"], params[k_last]["w"])
