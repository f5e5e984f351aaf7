"""Network summary table (models/summary.py) — the Darknet-style layer
printout plus the pruning-audit nonzero column, and its CLI."""

import jax
import numpy as np

from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import (
    init_params, num_conv_flops, parse_cfg, save_weights, yolov2_voc,
)
from modelcompression_tpu.models.darknet import conv_key
from modelcompression_tpu.models.summary import _fmt_count, network_table


def test_yolov2_table_matches_known_architecture():
    spec = yolov2_voc()
    t = network_table(spec)
    lines = t.splitlines()
    # final detection conv and the reorg/route plumbing
    assert "13x13x125" in t
    assert any(l.split()[1] == "reorg" for l in lines[1:-1])
    assert any(l.split()[1] == "route" for l in lines[1:-1])
    # totals agree with the canonical FLOPs helper and the known
    # 50.7M-param YOLOv2-VOC size
    assert _fmt_count(num_conv_flops(spec)) in lines[-1]
    assert "50.68M params" in lines[-1]
    # conv spatial walk: conv1 stays 416, first pool halves it
    assert "416x416x32" in lines[1]
    assert "208x208x32" in lines[2]


def test_table_maxpool_odd_and_stride1_dims():
    """Darknet pool output is (h-1)//stride + 1 — the stride-1 'same'
    pool of Tiny-YOLOv2 must not shrink the map."""
    txt = tiny_region_cfg(num_classes=3, width=64, height=64)
    spec = parse_cfg(txt)
    t = network_table(spec)
    assert "params" in t.splitlines()[0]
    # region row carries the class count
    assert "classes=3" in t


def test_layer_shapes_honor_explicit_maxpool_padding():
    """An explicit [maxpool] padding= knob must flow into layer_shapes —
    the table/FLOPs walk and the real forward agree on spatial dims."""
    import jax
    import jax.numpy as jnp

    from modelcompression_tpu.core.precision import FAST
    from modelcompression_tpu.models import forward, init_params
    from modelcompression_tpu.models.summary import layer_shapes

    cfg = """
[net]
batch=1
width=54
height=54
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2
padding=0

[convolutional]
filters=40
size=1
stride=1
pad=0
activation=linear

[region]
anchors=1.0,1.0
bias_match=1
classes=3
coords=4
num=1
softmax=1
jitter=0.2
rescore=1
"""
    spec = parse_cfg(cfg)
    shapes = layer_shapes(spec)
    params = init_params(spec, jax.random.key(0))
    y = forward(params, jnp.zeros((1, 54, 54, 3)), spec, FAST)
    # conv stride 2: 27x27; pool size2/stride2 padding=0 on the ODD
    # input: (27 + 0 - 2)//2 + 1 = 13 — the default-padding formula
    # (h-1)//2 + 1 would wrongly say 14
    assert shapes[1][:2] == (13, 13)
    assert y.shape[1:3] == shapes[-2][:2] == (13, 13)


def test_nonzero_column_reports_masked_sparsity():
    txt = tiny_region_cfg(num_classes=3, width=64, height=64)
    spec = parse_cfg(txt)
    params = jax.tree.map(np.asarray, init_params(spec, jax.random.key(0)))
    k = conv_key(spec.conv_indices()[0])
    w = params[k]["w"]
    half = w.size // 2
    flat = w.reshape(-1).copy()
    flat[:half] = 0.0
    params[k]["w"] = flat.reshape(w.shape)
    t = network_table(spec, params)
    assert "nonzero" in t.splitlines()[0]
    first_conv_row = t.splitlines()[1]
    pct = float(first_conv_row.split()[-1].rstrip("%"))
    assert 45.0 <= pct <= 55.0
    # untouched convs are 100% dense
    assert "100.0%" in t


def test_summary_cli(tmp_path, capsys):
    from modelcompression_tpu.cli import summary as summary_cli

    txt = tiny_region_cfg(num_classes=3, width=64, height=64)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(txt)
    assert summary_cli.main(["--cfg", cfg_path]) == 0
    out = capsys.readouterr().out
    assert "total:" in out and "FLOPs/img" in out

    spec = parse_cfg(txt)
    params = jax.tree.map(np.asarray, init_params(spec, jax.random.key(0)))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, params, seen=7)
    assert summary_cli.main(["--cfg", cfg_path, "--weights", wpath]) == 0
    out = capsys.readouterr().out
    assert "seen=7" in out and "nonzero" in out
