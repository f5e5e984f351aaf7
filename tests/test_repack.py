"""Structured repack tests (SURVEY.md §4.2b, §7.4.1): the slimmed model's
forward must equal the channel-masked model's forward — including through
the route/reorg passthrough head, the correctness trap.

On equality: in exact arithmetic slimmed == masked bitwise (dropped channels
contribute literal zeros). In fp32 the two XLA programs have different
channel counts and therefore different reduction groupings inside each conv,
so we assert a tight tolerance (~1 ulp per accumulation step), not bitwise
equality."""

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.compress import (
    channel_masks_from_keep, propagate_keep_sets, repack,
    uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.models import (
    ConvLayer, dump_cfg, forward, init_params, out_channels, parse_cfg,
    yolov2_voc,
)
from modelcompression_tpu.models.darknet import conv_key, num_params
from modelcompression_tpu.data.fixtures import tiny_region_cfg


def small_yolov2_spec():
    """The full yolov2 graph (route/reorg intact) at reduced width for test
    speed: parse the real cfg, then shrink input resolution."""
    spec = yolov2_voc()
    spec.net.width = spec.net.height = 96
    return spec


def test_keep_set_propagation_through_reorg_route():
    spec = small_yolov2_spec()
    params = init_params(spec, jax.random.key(0))
    keep_sets = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    in_keep, out_keep = propagate_keep_sets(spec, keep_sets)

    convs = spec.conv_indices()
    # conv16 (512ch passthrough source) pruned to 256
    assert len(out_keep[16]) == 256
    # conv26 (64ch, 1x1 on passthrough) input = conv16's keep
    np.testing.assert_array_equal(in_keep[26], out_keep[16])
    # reorg quadruples conv26's keep with block offsets of 64
    k26 = np.sort(out_keep[26])
    expect = np.concatenate([b * 64 + k26 for b in range(4)])
    # route(-1,-4) concat: reorg block (offset 0..256) then conv24
    # (offset 256, original 1024 channels)
    np.testing.assert_array_equal(in_keep[29][:len(expect)], expect)
    np.testing.assert_array_equal(
        in_keep[29][len(expect):], 256 + np.sort(out_keep[24]))
    # detection conv is protected
    assert len(out_keep[convs[-1]]) == 125


def test_slimmed_equals_masked_tiny():
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(1))
    keep_sets = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    new_spec, new_params = repack(spec, params, keep_sets)
    masks = channel_masks_from_keep(spec, keep_sets)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    y_masked = forward(params, x, spec, BITMATCH, channel_masks=masks)
    y_slim = forward(new_params, x, new_spec, BITMATCH)
    np.testing.assert_allclose(np.asarray(y_slim), np.asarray(y_masked),
                               rtol=1e-5, atol=1e-5)
    assert num_params(new_params) < num_params(params)


def test_slimmed_equals_masked_full_yolov2():
    """The big one: full YOLOv2 graph with route+reorg, 50% filter prune,
    exact equality of slimmed vs masked forward."""
    spec = small_yolov2_spec()
    params = init_params(spec, jax.random.key(2))
    keep_sets = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    new_spec, new_params = repack(spec, params, keep_sets)
    masks = channel_masks_from_keep(spec, keep_sets)

    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, 96, 96, 3)).astype(np.float32))
    y_masked = forward(params, x, spec, BITMATCH, channel_masks=masks)
    y_slim = forward(new_params, x, new_spec, BITMATCH)
    np.testing.assert_allclose(np.asarray(y_slim), np.asarray(y_masked),
                               rtol=2e-4, atol=2e-4)
    # 50% of filters dropped in prunable convs -> big param reduction
    assert num_params(new_params) < 0.45 * num_params(params)


def test_repacked_cfg_rewrite_roundtrip():
    """The slimmed spec serializes to a cfg that parses back to the same
    architecture (BASELINE.json:9 'emit rewritten cfg')."""
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(3))
    keep_sets = uniform_filter_fraction_keep_sets(spec, params, 0.25)
    new_spec, new_params = repack(spec, params, keep_sets)
    reparsed = parse_cfg(dump_cfg(new_spec))
    assert out_channels(reparsed) == out_channels(new_spec)
    for i, l in enumerate(reparsed.layers):
        if isinstance(l, ConvLayer):
            assert l.filters == new_spec.layers[i].filters
            assert l.in_channels == new_spec.layers[i].in_channels
            # sliced params actually match the new shapes
            w = new_params[conv_key(i)]["w"]
            assert w.shape == (l.size, l.size, l.in_channels, l.filters)


def test_repack_weight_slicing_values():
    """Sliced weights are the original values at kept indices."""
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(4))
    keep_sets = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    in_keep, out_keep = propagate_keep_sets(spec, keep_sets)
    _, new_params = repack(spec, params, keep_sets)
    i = spec.conv_indices()[1]
    w = np.asarray(params[conv_key(i)]["w"])
    w2 = np.asarray(new_params[conv_key(i)]["w"])
    np.testing.assert_array_equal(
        w2, w[:, :, in_keep[i], :][:, :, :, out_keep[i]])
    np.testing.assert_array_equal(
        np.asarray(new_params[conv_key(i)]["gamma"]),
        np.asarray(params[conv_key(i)]["gamma"])[out_keep[i]])
