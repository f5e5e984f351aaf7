"""YOLOv3-SPP (public darknet yolov3-spp.cfg): spatial pyramid pooling —
three stride-1 maxpools over one map, 4-way route concat, 1x1 bottleneck.

The SPP block is the one public graph where a single conv's channels
appear FOUR times in one route concat (each pool is channel-preserving),
so it stresses exactly the repeated-source provenance paths of
compress/graph.py and compress/repack.py that reorg stresses for v2.
"""

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.compress import (
    channel_masks_from_keep, propagate_keep_sets, repack,
)
from modelcompression_tpu.compress.graph import (
    protected_conv_indices, prunable_conv_indices,
)
from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.models import (
    forward, init_params, parse_cfg, yolov3_spp_coco,
)
from modelcompression_tpu.models.cfg import (
    MaxPoolLayer, RouteLayer, ShortcutLayer,
)
from tests.oracle.torch_ref import torch_forward


def spp_fixture_cfg(num_classes: int = 3) -> str:
    """Minimal single-head net with a canonical SPP block (5/9/13
    stride-1 pools, 4-way concat of the SAME conv's channels)."""
    det = 2 * (5 + num_classes)
    return f"""
[net]
batch=2
subdivisions=1
width=32
height=32
channels=3
learning_rate=0.001
momentum=0.9
decay=0.0005
max_batches=500
policy=constant

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=12
size=3
stride=1
pad=1
activation=leaky

[maxpool]
stride=1
size=5

[route]
layers=-2

[maxpool]
stride=1
size=9

[route]
layers=-4

[maxpool]
stride=1
size=13

[route]
layers=-1,-3,-5,-6

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters={det}
activation=linear

[yolo]
mask = 0,1
anchors = 8,8,  16,16
classes={num_classes}
num=2
jitter=.3
ignore_thresh = .7
truth_thresh = 1
random=0
"""


def test_zoo_spp_canonical_structure():
    """yolov3-spp.cfg reproduces the public graph: yolov3 + 7 layers
    (3 pools, 3 routes, 1 bottleneck conv) in the first head block."""
    spec = yolov3_spp_coco()
    assert len(spec.layers) == 114
    assert len(spec.conv_indices()) == 76
    assert spec.head_indices() == [89, 101, 113]
    assert spec.classes == 80

    pools = [(i, l.size, l.stride) for i, l in enumerate(spec.layers)
             if isinstance(l, MaxPoolLayer)]
    assert pools == [(78, 5, 1), (80, 9, 1), (82, 13, 1)]
    spp_route = next(l for l in spec.layers
                     if isinstance(l, RouteLayer) and len(l.layers) == 4)
    assert spp_route.layers == (82, 80, 78, 77)  # pools + their source

    # FPN lateral taps unchanged from yolov3 (insertion is post-backbone)
    taps = [l.layers for l in spec.layers if isinstance(l, RouteLayer)
            and len(l.layers) == 2]
    assert [t[1] for t in taps] == [61, 36]
    assert sum(isinstance(l, ShortcutLayer) for l in spec.layers) == 23

    # protection: same 28 tied + 3 head convs as yolov3; the new SPP
    # bottleneck conv (84) is prunable -> 45 prunable of 76
    assert len(prunable_conv_indices(spec)) == 45
    assert len(protected_conv_indices(spec)) == 31
    assert 84 in prunable_conv_indices(spec)


def test_spp_fixture_forward_matches_oracle():
    spec = parse_cfg(spp_fixture_cfg())
    params = init_params(spec, jax.random.key(0))
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)

    y = forward(params, jnp.asarray(x), spec, BITMATCH)
    assert isinstance(y, tuple) and len(y) == 1
    ref = torch_forward(params, np.transpose(x, (0, 3, 1, 2)), spec)
    ref0 = np.transpose(ref[0], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y[0]), ref0,
                               rtol=1e-5, atol=1e-5)


def test_spp_repack_repeated_source_propagation():
    """Pruning the SPP source conv must drop the SAME channel positions in
    all four concat blocks of the consumer's input."""
    spec = parse_cfg(spp_fixture_cfg())
    convs = spec.conv_indices()
    src, bottleneck = convs[1], convs[2]  # conv feeding SPP; 1x1 after
    keep_sets = {src: np.array([0, 2, 5, 7, 9, 11]),
                 bottleneck: np.array([1, 3, 4, 8])}
    in_keep, out_keep = propagate_keep_sets(spec, keep_sets)

    k = keep_sets[src]
    expect = np.concatenate([b * 12 + k for b in range(4)])
    np.testing.assert_array_equal(in_keep[bottleneck], expect)

    # bottleneck's own prune flows into the head conv's input
    head_conv = convs[3]
    np.testing.assert_array_equal(in_keep[head_conv],
                                  keep_sets[bottleneck])


def test_spp_int8_ptq_close_to_float():
    """int8 PTQ through the SPP block: the 4-way route's scale groups
    must merge the pool outputs (all sharing the source conv's activation
    scale), so the quantized forward stays close to float."""
    from modelcompression_tpu.compress import (
        forward_quantized, quantize_from_batches,
    )
    from modelcompression_tpu.models import fold_batchnorm

    spec = parse_cfg(spp_fixture_cfg())
    params = init_params(spec, jax.random.key(4))
    folded = fold_batchnorm(params, spec)
    rng = np.random.default_rng(5)
    calib = [rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)]
    q = quantize_from_batches(folded, spec, calib)

    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    from modelcompression_tpu.models import forward_folded
    y_f = forward_folded(folded, x, spec, BITMATCH)
    y_q = forward_quantized(q, x, spec)
    for a, b in zip(y_q, y_f):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.15


def test_spp_weights_roundtrip_exact():
    """.weights codec walks the SPP graph's conv order byte-exactly."""
    import io

    from modelcompression_tpu.models.weights_io import (
        load_weights, roundtrip_bytes,
    )

    spec = parse_cfg(spp_fixture_cfg())
    params = init_params(spec, jax.random.key(5))
    blob = roundtrip_bytes(spec, params, seen=7)
    loaded, seen = load_weights(io.BytesIO(blob), spec)
    assert seen == 7
    for k, p in params.items():
        for name, v in p.items():
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(loaded[k][name]))


def test_spp_slimmed_equals_masked():
    spec = parse_cfg(spp_fixture_cfg())
    params = init_params(spec, jax.random.key(2))
    convs = spec.conv_indices()
    keep_sets = {convs[0]: np.arange(4),
                 convs[1]: np.array([0, 2, 5, 7, 9, 11]),
                 convs[2]: np.array([1, 3, 4, 8])}
    new_spec, new_params = repack(spec, params, keep_sets)
    masks = channel_masks_from_keep(spec, keep_sets)

    x = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (2, 32, 32, 3)).astype(np.float32))
    y_masked = forward(params, x, spec, BITMATCH, channel_masks=masks)
    y_slim = forward(new_params, x, new_spec, BITMATCH)
    assert isinstance(y_slim, tuple)
    for a, b in zip(y_slim, y_masked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    # the SPP concat physically narrowed: 4*12 -> 4*6 input channels
    bl = new_spec.layers[convs[2]]
    assert bl.in_channels == 24
