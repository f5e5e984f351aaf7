"""Channel-provenance analysis + structured pruning on branchy graphs
(compress/graph.py): shortcut-tied keep-sets, multi-head protection, and
repack through [shortcut]/[upsample]/[yolo] — the YOLOv3 extension of the
repack correctness trap (SURVEY.md §7.4.1).

Fixture v3 graph (data/fixtures.tiny_yolo3_cfg) layer indices:
  0 conv16  1 pool  2 conv32  3 pool  4 conv32(1x1)  5 conv32(3x3)
  6 shortcut(from=3)  7 conv64/s2  8 conv48  9 conv-det  10 yolo
  11 route(8)  12 conv24  13 upsample  14 route(13,6)  15 conv32
  16 conv-det  17 yolo
so the tie group is {2, 5} (layer 3 is a pool passing conv2's channels
into the add) and the head producers are {9, 16}.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.compress import (
    channel_masks_from_keep, channel_source_convs, head_producer_convs,
    propagate_keep_sets, protected_conv_indices, prunable_conv_indices,
    repack, taylor_gate_indices, tied_conv_groups,
    uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.compress.criteria import (
    fpgm_scores_device, l1_filter_scores_device,
)
from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.data.fixtures import tiny_region_cfg, tiny_yolo3_cfg
from modelcompression_tpu.models import (
    ConvLayer, dump_cfg, forward, init_params, out_channels, parse_cfg,
    yolov2_voc, yolov3_coco, yolov3_tiny_voc,
)
from modelcompression_tpu.models.darknet import conv_key, num_params
from modelcompression_tpu.models.zoo import tiny_yolov2_voc


@pytest.fixture(scope="module")
def v3spec():
    return parse_cfg(tiny_yolo3_cfg(num_classes=3))


# ------------------------------------------------------------- provenance


def test_channel_sources_fixture_v3(v3spec):
    src = channel_source_convs(v3spec)
    assert src[0] == frozenset({0})
    assert src[1] == frozenset({0})          # pool inherits
    assert src[6] == frozenset({2, 5})       # shortcut unions both addends
    assert src[13] == frozenset({12})        # upsample inherits
    assert src[14] == frozenset({12, 2, 5})  # route unions its parts
    assert src[17] == frozenset({16})        # head passes through


def test_tied_groups_and_heads_fixture_v3(v3spec):
    assert tied_conv_groups(v3spec) == [{2, 5}]
    assert head_producer_convs(v3spec) == {9, 16}
    assert protected_conv_indices(v3spec) == {2, 5, 9, 16}
    assert prunable_conv_indices(v3spec) == [0, 4, 7, 8, 12, 15]
    # taylor's gate set follows the same rule
    assert taylor_gate_indices(v3spec) == (0, 4, 7, 8, 12, 15)


def test_yolov2_protection_reduces_to_last_conv():
    """For chain graphs the generic rule must reproduce the old behavior
    exactly: protect the single detection conv, nothing else."""
    for spec in (yolov2_voc(), tiny_yolov2_voc(),
                 parse_cfg(tiny_region_cfg(num_classes=3))):
        conv = spec.conv_indices()
        assert tied_conv_groups(spec) == []
        assert protected_conv_indices(spec) == {conv[-1]}
        assert prunable_conv_indices(spec) == conv[:-1]


def test_yolov3_tiny_protection():
    spec = yolov3_tiny_voc()
    assert tied_conv_groups(spec) == []  # no residuals in tiny-v3
    assert protected_conv_indices(spec) == {15, 22}  # the two head convs
    assert len(prunable_conv_indices(spec)) == 11


def test_yolov3_full_protection():
    """Darknet-53 stages (1,2,8,8,4 residual blocks) each tie their
    downsample conv with every block's second conv into ONE group —
    the Li et al. 2017 ResNet recipe leaves those identity paths intact;
    the 23 block-internal 1x1s and the FPN/neck convs stay prunable."""
    spec = yolov3_coco()
    groups = tied_conv_groups(spec)
    assert sorted(len(g) for g in groups) == [2, 3, 5, 9, 9]
    assert head_producer_convs(spec) == {81, 93, 105}
    prot = protected_conv_indices(spec)
    assert len(prot) == 28 + 3
    assert len(prunable_conv_indices(spec)) == 75 - 31


def test_criteria_score_maps_respect_protection(v3spec):
    params = init_params(v3spec, jax.random.key(0))
    for fn in (l1_filter_scores_device, fpgm_scores_device):
        scores = fn(params, v3spec, skip=(0,))
        assert sorted(scores) == [4, 7, 8, 12, 15]  # skip + protected out
        for i, s in scores.items():
            assert s.shape == (v3spec.layers[i].filters,)


# ------------------------------------------------------------------ repack


def test_slimmed_equals_masked_v3_fixture(v3spec):
    """Default protection: prune the 6 prunable convs at 50%, repack
    through shortcut/upsample/route, and require the slimmed multi-head
    forward to match the masked twin on every scale."""
    params = init_params(v3spec, jax.random.key(1))
    keep_sets = uniform_filter_fraction_keep_sets(v3spec, params, 0.5)
    assert sorted(keep_sets) == [0, 4, 7, 8, 12, 15]
    new_spec, new_params = repack(v3spec, params, keep_sets)
    masks = channel_masks_from_keep(v3spec, keep_sets)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    y_masked = forward(params, x, v3spec, BITMATCH, channel_masks=masks)
    y_slim = forward(new_params, x, new_spec, BITMATCH)
    assert isinstance(y_slim, tuple) and len(y_slim) == 2
    for a, b in zip(y_slim, y_masked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    assert num_params(new_params) < num_params(params)


def test_slimmed_equals_masked_through_tied_shortcut(v3spec):
    """Hand-built keep-set that DOES prune the residual path: both tied
    convs share one keep-set, so the slimmed add stays aligned — the
    equivalence must hold through the actual shortcut slice."""
    params = init_params(v3spec, jax.random.key(2))
    rng = np.random.default_rng(2)
    shared = np.sort(rng.choice(32, size=20, replace=False)).astype(np.int64)
    keep_sets = {2: shared, 5: shared.copy(),
                 4: np.arange(16, dtype=np.int64)}  # plus an internal conv
    new_spec, new_params = repack(v3spec, params, keep_sets)
    assert new_spec.layers[2].filters == 20
    masks = channel_masks_from_keep(v3spec, keep_sets)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y_masked = forward(params, x, v3spec, BITMATCH, channel_masks=masks)
    y_slim = forward(new_params, x, new_spec, BITMATCH)
    for a, b in zip(y_slim, y_masked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_shortcut_keep_mismatch_fails_loudly(v3spec):
    params = init_params(v3spec, jax.random.key(3))
    # different counts
    with pytest.raises(ValueError, match="keep-set mismatch"):
        repack(v3spec, params, {2: np.arange(16), 5: np.arange(32)})
    # same count, different channels
    with pytest.raises(ValueError, match="different channels"):
        repack(v3spec, params, {2: np.arange(16), 5: np.arange(16) + 8})


def test_keep_propagation_through_upsample_route(v3spec):
    params = init_params(v3spec, jax.random.key(4))
    keep_sets = uniform_filter_fraction_keep_sets(v3spec, params, 0.5)
    in_keep, out_keep = propagate_keep_sets(v3spec, keep_sets)
    # conv15's input = route(upsample(conv12), shortcut@6): conv12's keep
    # first, then the (unpruned) 32 shortcut channels at offset 24
    k12 = np.sort(out_keep[12])
    assert len(k12) == 12
    np.testing.assert_array_equal(in_keep[15][:12], k12)
    np.testing.assert_array_equal(in_keep[15][12:], 24 + np.arange(32))
    # head producers keep their full decode contract
    det = 2 * (5 + 3)
    assert len(out_keep[9]) == det and len(out_keep[16]) == det


def test_repacked_v3_cfg_roundtrip(v3spec):
    params = init_params(v3spec, jax.random.key(5))
    keep_sets = uniform_filter_fraction_keep_sets(v3spec, params, 0.25)
    new_spec, new_params = repack(v3spec, params, keep_sets)
    reparsed = parse_cfg(dump_cfg(new_spec))
    assert out_channels(reparsed) == out_channels(new_spec)
    for i, l in enumerate(reparsed.layers):
        if isinstance(l, ConvLayer):
            w = new_params[conv_key(i)]["w"]
            assert w.shape == (l.size, l.size, l.in_channels, l.filters)


def test_prune_cli_l1_filter_on_v3(tmp_path):
    """The prune CLI end-to-end on a v3 spec: slimmed weights + rewritten
    cfg load back and run the multi-head forward."""
    from modelcompression_tpu.cli.prune import main as prune_main
    from modelcompression_tpu.models import load_cfg, load_weights, \
        save_weights

    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(6))
    cfg_path = str(tmp_path / "v3.cfg")
    w_path = str(tmp_path / "v3.weights")
    with open(cfg_path, "w") as f:
        f.write(dump_cfg(spec))
    save_weights(w_path, spec, params)

    out_w = str(tmp_path / "slim.weights")
    out_cfg = str(tmp_path / "slim.cfg")
    rc = prune_main(["--cfg", cfg_path, "--weights", w_path,
                     "--mode", "l1_filter", "--fraction", "0.5",
                     "--out", out_w, "--out-cfg", out_cfg])
    assert rc == 0
    slim_spec = load_cfg(out_cfg)
    slim_params, _ = load_weights(out_w, slim_spec)
    # protected convs untouched, prunable convs halved
    assert slim_spec.layers[2].filters == 32
    assert slim_spec.layers[0].filters == 8
    raws = forward(slim_params, jnp.zeros((1, 64, 64, 3)), slim_spec,
                   BITMATCH)
    assert isinstance(raws, tuple) and len(raws) == 2
