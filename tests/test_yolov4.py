"""Full YOLOv4 (fourth detector family config — CSPDarknet53 + SPP +
PAN, tools/gen_yolov4_cfg.py): canonical structure pinned against the
public anchors (64M params / 128.46 BFLOPS at 608), clean strict parse
(every [yolo] train key consumed), forward smoke through the whole
graph, and structured prune + physical repack through the SPP repeats
and both PAN concat directions.

Op-level numerics are oracle-tested elsewhere: every building block of
this graph — mish/leaky convs, stride-1 SPP maxpools + repeated-source
routes (tests/test_spp.py), shortcut residuals (test_yolov3.py),
upsample+concat FPN and strided-conv downsample (test_yolov3.py,
test_model_oracle.py), CSP route-back splits (test_yolov4_tiny.py),
multi-head scale_x_y decode (test_yolov4_tiny.py) — already has a torch
oracle; this file pins the full-graph COMPOSITION."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.core.precision import FAST
from modelcompression_tpu.models import (
    init_params, num_conv_flops, parse_cfg, yolov4_coco, yolov4_voc,
)
from modelcompression_tpu.models.cfg import (
    ConvLayer, MaxPoolLayer, RouteLayer, ShortcutLayer, UpsampleLayer,
    YoloLayer, dump_cfg,
)
from modelcompression_tpu.models.darknet import forward, num_params


@pytest.fixture(scope="module")
def spec80():
    return yolov4_coco()


def test_canonical_structure_and_public_anchors(spec80):
    """162 layers; the PAN/SPP routes hit the canonical yolov4.cfg
    indices (or public yolov4.weights would misalign); params/FLOPs
    match the published 64M / 128.46-BFLOPS-at-608 anchors."""
    spec = spec80
    assert len(spec.layers) == 162
    assert spec.head_indices() == [139, 150, 161]
    counts = {}
    for l in spec.layers:
        counts[type(l).__name__] = counts.get(type(l).__name__, 0) + 1
    assert counts == {"ConvLayer": 110, "RouteLayer": 21,
                      "ShortcutLayer": 23, "MaxPoolLayer": 3,
                      "UpsampleLayer": 2, "YoloLayer": 3}
    # CSP stage outputs and the neck routes (canonical indices)
    assert spec.layers[119].layers == (85,)   # top-down 1 -> P4 stage
    assert spec.layers[129].layers == (54,)   # top-down 2 -> P3 stage
    assert spec.layers[113].layers == (112, 110, 108, 107)  # SPP concat
    assert spec.layers[142].layers == (141, 126)  # bottom-up 1
    assert spec.layers[153].layers == (152, 116)  # bottom-up 2
    # grid-sensitivity scales per head, fine->coarse
    sxy = [spec.layers[i].scale_x_y for i in spec.head_indices()]
    assert sxy == [1.2, 1.1, 1.05]
    # canonical CIoU training keys on every head
    for i in spec.head_indices():
        h = spec.layers[i]
        assert isinstance(h, YoloLayer)
        assert h.iou_loss == "ciou" and h.iou_normalizer == 0.07
        assert h.iou_thresh == 0.213 and h.max_delta == 5.0
    # public anchors: paper/README report ~64.0M params, 128.46 BFLOPS
    # at 608x608 (conv MACs x2); the exact conv+BN accounting here is
    # 64,429,405 params and 128.39 conv-GFLOP — inside 0.7% / 0.06%
    n = sum(l.size * l.size * l.in_channels * l.filters
            + l.filters * (4 if l.batch_normalize else 1)
            for l in spec.layers if isinstance(l, ConvLayer))
    assert n == 64_429_405
    assert abs(num_conv_flops(spec) / 1e9 - 128.39) < 0.1
    voc = yolov4_voc()
    assert abs(num_conv_flops(voc) / 1e9 - 59.67) < 0.1
    assert voc.classes == 20 and voc.net.width == 416


def test_strict_parse_and_roundtrip(spec80):
    """Every key in the shipped cfgs is CONSUMED (strict parse raises on
    nothing, warns on nothing) and dump_cfg round-trips the spec."""
    import os

    from modelcompression_tpu.models.zoo import CONFIG_DIR
    for name in ("yolov4.cfg", "yolov4-voc.cfg"):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            with open(os.path.join(CONFIG_DIR, name)) as f:
                spec = parse_cfg(f.read(), strict=True)
        assert parse_cfg(dump_cfg(spec)) == spec


def test_forward_smoke_all_heads(spec80):
    """One jitted forward through all 162 layers (mish backbone, SPP,
    both PAN directions) at a reduced 128px input: three raw maps at
    strides 8/16/32 with A*(5+C) channels, all finite."""
    params = init_params(spec80, jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, 128, 128, 3)).astype(np.float32))
    outs = forward(params, x, spec80, FAST)
    assert isinstance(outs, tuple) and len(outs) == 3
    want = {139: 16, 150: 8, 161: 4}  # 128/8, /16, /32
    for raw, (hi, g) in zip(outs, want.items()):
        assert raw.shape == (1, g, g, 3 * 85), (hi, raw.shape)
        assert np.isfinite(np.asarray(raw, np.float32)).all()


def test_prune_repack_through_spp_and_pan(spec80):
    """Uniform 50% L1-filter prune + physical repack through the full
    graph: keep-sets propagate through the SPP repeated-source concat,
    both top-down upsample concats and both bottom-up strided concats;
    the FLOP model predicts the repacked network exactly; the rewritten
    cfg re-validates on parse; head producers keep the decode contract."""
    from modelcompression_tpu.compress import (
        repack, total_conv_flops, uniform_filter_fraction_keep_sets,
    )
    from modelcompression_tpu.compress.graph import protected_conv_indices

    spec = spec80
    params = init_params(spec, jax.random.key(2))
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    protected = protected_conv_indices(spec)
    assert not (set(keep) & protected)
    # the route-back CSP form is PLAIN routes — no grouped slices, so no
    # split-balance constraints; shortcut ties protect the residual
    # stage trunks, heads protect the 3 det convs
    assert len(keep) > 40  # plenty of prunable convs remain
    slim_spec, slim_params = repack(spec, params, keep)
    predicted = total_conv_flops(spec, {i: len(k) for i, k in keep.items()})
    assert predicted == num_conv_flops(slim_spec)
    assert num_params(slim_params) < 0.55 * num_params(params)
    # det convs keep A*(5+C) = 255 filters
    for hi in slim_spec.head_indices():
        assert slim_spec.layers[hi - 1].filters == 255
    parse_cfg(dump_cfg(slim_spec))  # re-validates routes/shortcuts


def test_iterative_loop_accepts_v4(spec80):
    """The tied/protection analysis on the full graph: residual stage
    trunks form shortcut-tied groups (1/2/8/8/4 blocks -> 5 groups),
    exactly the Li et al. ResNet shape the tied-group machinery covers."""
    from modelcompression_tpu.compress.graph import tied_conv_groups

    groups = tied_conv_groups(spec80)
    assert len(groups) == 5
    sizes = sorted(len(g) for g in groups)
    # each stage ties the residual-branch entry conv + every block's
    # second conv: blocks+1 members
    assert sizes == [2, 3, 5, 9, 9]


def test_summary_cli_on_full_v4(capsys):
    """The Darknet-style summary table renders the whole 162-layer graph
    (routes/shortcuts/SPP/upsample indices resolve) with the pinned
    totals — the cheapest whole-surface smoke for the new cfgs."""
    import os

    from modelcompression_tpu.cli import summary as summary_cli
    from modelcompression_tpu.models.zoo import CONFIG_DIR

    rc = summary_cli.main(["--cfg", os.path.join(CONFIG_DIR, "yolov4.cfg")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "64.4M" in out or "64,429,405" in out or "64.43" in out
