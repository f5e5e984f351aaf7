"""FLOP-targeted automatic filter allocation (compress/flops.py).

Pins the three contracts:
* the alive-count FLOP model decomposes ``darknet.num_conv_flops`` exactly
  and predicts the PHYSICALLY REPACKED network's FLOPs (route/reorg and
  shortcut/upsample graphs both);
* the greedy global rank lands at (and not meaningfully under) the budget,
  respects min_filters, and fails loudly on unreachable targets;
* low-importance layers get pruned MORE — the non-uniform allocation the
  feature exists to discover.
"""

import jax
import numpy as np
import pytest

from modelcompression_tpu.compress import (
    conv_flops_by_layer, filter_scores_device, flop_targeted_keep_sets,
    repack, total_conv_flops,
)
from modelcompression_tpu.data.fixtures import tiny_region_cfg, tiny_yolo3_cfg
from modelcompression_tpu.models import (
    init_params, num_conv_flops, parse_cfg, yolov2_voc,
)
from modelcompression_tpu.models.cfg import ConvLayer


def _spec_params(cfg_text):
    spec = parse_cfg(cfg_text)
    return spec, init_params(spec, jax.random.key(0))


def test_flop_model_matches_num_conv_flops():
    """With no overrides the per-layer decomposition sums to the model
    module's own accounting — on the route/reorg (v2) and
    shortcut/upsample ([yolo]) graphs both."""
    for spec in (yolov2_voc(),
                 parse_cfg(tiny_yolo3_cfg(num_classes=3, width=64,
                                          height=64))):
        by_layer = conv_flops_by_layer(spec)
        assert set(by_layer) == set(spec.conv_indices())
        assert sum(by_layer.values()) == num_conv_flops(spec)
        assert total_conv_flops(spec) == num_conv_flops(spec)


def test_flop_model_predicts_repacked_flops():
    """alive-count prediction == num_conv_flops of the actually repacked
    spec, keep-sets from the real target-flops path."""
    spec = yolov2_voc()
    spec.net.width = spec.net.height = 96
    params = init_params(spec, jax.random.key(1))
    scores = filter_scores_device(params, spec)
    keep, fractions = flop_targeted_keep_sets(spec, scores, target=0.3)
    predicted = total_conv_flops(spec, {i: len(k) for i, k in keep.items()})
    slim_spec, _ = repack(spec, params, keep)
    assert predicted == num_conv_flops(slim_spec)
    # budget respected, and not overshot into oblivion: one more filter
    # anywhere costs well under 5% of base on this graph
    base = total_conv_flops(spec)
    assert predicted <= 0.3 * base
    assert predicted > 0.25 * base
    # the discovered schedule is a real non-uniform allocation
    assert len(set(round(f, 3) for f in fractions.values())) > 1


def test_low_importance_layers_pruned_more():
    """Two-conv chain, hand scores: the layer whose (normalized) scores
    are flat-low loses filters before the layer with concentrated
    importance."""
    spec, params = _spec_params(tiny_region_cfg(num_classes=3, width=64,
                                                height=64))
    convs = spec.conv_indices()
    a, b = convs[0], convs[1]
    rng = np.random.default_rng(0)
    scores = {}
    # conv a: one dominant filter, rest near-zero -> after l2 norm the
    # rest rank lowest globally; conv b: uniform -> each mid-ranked
    sa = np.full(spec.layers[a].filters, 1e-3)
    sa[0] = 1.0
    scores[a] = sa
    scores[b] = np.ones(spec.layers[b].filters) + rng.uniform(
        0, 1e-6, spec.layers[b].filters)
    for i in convs[2:-1]:
        scores[i] = np.ones(spec.layers[i].filters)
    keep, fractions = flop_targeted_keep_sets(spec, scores, target=0.6)
    assert fractions[a] > fractions[b]
    # the dominant filter of conv a always survives
    assert 0 in keep[a]


def test_min_filters_and_unreachable_target():
    spec, params = _spec_params(tiny_region_cfg(num_classes=3, width=64,
                                                height=64))
    scores = filter_scores_device(params, spec)
    keep, _ = flop_targeted_keep_sets(spec, scores, target=0.05,
                                      min_filters=2)
    assert all(len(k) >= 2 for k in keep.values())
    with pytest.raises(ValueError, match="reachable floor"):
        flop_targeted_keep_sets(spec, scores, target=1e-6, min_filters=4)
    with pytest.raises(ValueError, match="target"):
        flop_targeted_keep_sets(spec, scores, target=1.5)
    bad = dict(scores)
    bad[next(iter(bad))] = np.ones(3)  # wrong length
    with pytest.raises(ValueError, match="scores"):
        flop_targeted_keep_sets(spec, bad, target=0.5)


def test_keep_sets_are_valid_and_deterministic():
    spec, params = _spec_params(tiny_region_cfg(num_classes=3, width=64,
                                                height=64))
    scores = filter_scores_device(params, spec)
    k1, f1 = flop_targeted_keep_sets(spec, scores, target=0.4)
    k2, f2 = flop_targeted_keep_sets(spec, scores, target=0.4)
    for i in k1:
        np.testing.assert_array_equal(k1[i], k2[i])
        assert k1[i].dtype == np.int32
        assert np.all(np.diff(k1[i]) > 0)  # sorted, unique
        assert 1 <= len(k1[i]) <= spec.layers[i].filters
    assert f1 == f2


def test_prune_cli_target_flops(tmp_path):
    """prune --mode l1_filter --target-flops: slimmed cfg+weights written,
    resulting conv FLOPs within budget, guards fire."""
    from modelcompression_tpu.cli import prune
    from modelcompression_tpu.models import load_cfg, load_weights

    cfg_text = tiny_region_cfg(num_classes=3, width=64, height=64)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(cfg_text)
    spec = parse_cfg(cfg_text)
    from modelcompression_tpu.models import save_weights
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)

    out = str(tmp_path / "slim.weights")
    out_cfg = str(tmp_path / "slim.cfg")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter", "--target-flops", "0.4",
                     "--out", out, "--out-cfg", out_cfg])
    assert rc == 0
    slim = load_cfg(out_cfg)
    load_weights(out, slim)  # roundtrips against the written cfg
    assert num_conv_flops(slim) <= 0.4 * num_conv_flops(spec)
    # head conv protected
    convs = [l for l in slim.layers if isinstance(l, ConvLayer)]
    assert convs[-1].filters == 5 * (5 + 3)

    # guards: composing with --fraction, --fractions + tied group, range
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter", "--target-flops", "0.4",
                     "--fraction", "0.5", "--out", out])
    assert rc == 2
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter", "--fractions", "0:0.5",
                     "--tied", "group", "--out", out])
    assert rc == 2
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter", "--target-flops", "1.4",
                     "--out", out])
    assert rc == 2


def test_flop_target_tied_groups_join_the_allocation():
    """--target-flops + --tied group (round 4; formerly rejected): tied
    groups enter the budget allocation as single rank units — shared
    keep-sets stay group-aligned, the FLOP model still predicts the
    repacked network exactly, and budgets BELOW the protect-mode floor
    become reachable because the identity paths can now shrink."""
    from modelcompression_tpu.compress import tied_group_scores_device

    spec, params = _spec_params(tiny_yolo3_cfg(num_classes=3, width=64,
                                               height=64))
    scores = filter_scores_device(params, spec)
    gscores = tied_group_scores_device(params, spec)
    assert set(gscores) == {(2, 5)}

    keep, fractions = flop_targeted_keep_sets(
        spec, scores, target=0.35, group_scores=gscores)
    np.testing.assert_array_equal(keep[2], keep[5])  # group-aligned
    predicted = total_conv_flops(spec, {i: len(k) for i, k in keep.items()})
    slim_spec, _ = repack(spec, params, keep)
    assert predicted == num_conv_flops(slim_spec)
    assert predicted <= 0.35 * total_conv_flops(spec)

    # a target below the PROTECT-mode floor is reachable with groups
    base = total_conv_flops(spec)
    protect_alive = {i: 1 for i in scores}
    protect_floor = total_conv_flops(spec, protect_alive) / base
    group_alive = {**protect_alive, **{i: 1 for g in gscores for i in g}}
    group_floor = total_conv_flops(spec, group_alive) / base
    assert group_floor < protect_floor
    mid = (group_floor + protect_floor) / 2
    with pytest.raises(ValueError, match="reachable floor"):
        flop_targeted_keep_sets(spec, scores, target=mid)
    keep2, _ = flop_targeted_keep_sets(spec, scores, target=mid,
                                       group_scores=gscores)
    got = total_conv_flops(spec, {i: len(k) for i, k in keep2.items()})
    assert got <= mid * base

    # validation: overlapping / malformed group maps fail loudly
    with pytest.raises(ValueError, match="both untied"):
        flop_targeted_keep_sets(
            spec, scores, target=0.5,
            group_scores={(next(iter(scores)),): np.ones(
                spec.layers[next(iter(scores))].filters)})
    with pytest.raises(ValueError, match="group scores"):
        flop_targeted_keep_sets(spec, scores, target=0.5,
                                group_scores={(2, 5): np.ones(3)})


def test_prune_cli_target_flops_tied_group(tmp_path):
    """CLI composition on a shortcut graph: the tied group is slimmed
    inside the budget allocation and the written cfg stays aligned."""
    from modelcompression_tpu.cli import prune
    from modelcompression_tpu.models import load_cfg, save_weights

    cfg_text = tiny_yolo3_cfg(num_classes=3, width=64, height=64)
    cfg_path = str(tmp_path / "v3.cfg")
    open(cfg_path, "w").write(cfg_text)
    spec = parse_cfg(cfg_text)
    params = init_params(spec, jax.random.key(3))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    out = str(tmp_path / "slim.weights")
    out_cfg = str(tmp_path / "slim.cfg")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter", "--target-flops", "0.3",
                     "--tied", "group", "--out", out,
                     "--out-cfg", out_cfg])
    assert rc == 0
    slim = load_cfg(out_cfg)  # parse re-validates shortcut alignment
    assert num_conv_flops(slim) <= 0.3 * num_conv_flops(spec)
    assert slim.layers[2].filters == slim.layers[5].filters


def test_flop_target_csp_balanced_units():
    """--target-flops on a CSP graph (round 5, VERDICT r4 Missing #5):
    balance-constrainable grouped-route sources join the allocation as
    balanced-STEP rank units — every step drops one filter per split
    block, so the discovered keep-set is split-balanced (repack's slice
    invariant), the FLOP model still predicts the repacked network
    exactly, and budgets below the protect-mode floor become reachable."""
    from modelcompression_tpu.compress import csp_balanced_scores_device
    from modelcompression_tpu.data.fixtures import tiny_yolo4_cfg

    spec, params = _spec_params(tiny_yolo4_cfg(num_classes=3))
    scores = filter_scores_device(params, spec)
    cscores = csp_balanced_scores_device(params, spec)
    assert set(cscores) == {1} and cscores[1][0] == 2
    assert 1 not in scores  # grouped-route source: not in the plain map

    keep, fractions = flop_targeted_keep_sets(
        spec, scores, target=0.25, csp_scores=cscores)
    k1 = np.asarray(keep[1])
    o, parts = spec.layers[1].filters, cscores[1][0]
    block = o // parts
    assert len(k1) % parts == 0 and len(k1) < o  # pruned AND balanced
    assert int((k1 < block).sum()) == int((k1 >= block).sum())
    predicted = total_conv_flops(spec, {i: len(k) for i, k in keep.items()})
    slim_spec, _ = repack(spec, params, keep)  # validates the balance
    assert predicted == num_conv_flops(slim_spec)
    assert predicted <= 0.25 * total_conv_flops(spec)
    assert 0.0 < fractions[1] < 1.0

    # a target below the protect-mode floor is reachable with csp units
    base = total_conv_flops(spec)
    protect_floor = total_conv_flops(
        spec, {i: 1 for i in scores}) / base
    csp_floor = total_conv_flops(
        spec, {**{i: 1 for i in scores}, 1: parts}) / base
    assert csp_floor < protect_floor
    mid = (csp_floor + protect_floor) / 2
    with pytest.raises(ValueError, match="reachable floor"):
        flop_targeted_keep_sets(spec, scores, target=mid)
    keep2, _ = flop_targeted_keep_sets(spec, scores, target=mid,
                                       csp_scores=cscores)
    got = total_conv_flops(spec, {i: len(k) for i, k in keep2.items()})
    assert got <= mid * base
    k2 = np.asarray(keep2[1])
    assert int((k2 < block).sum()) == int((k2 >= block).sum())

    # validation: overlaps and bad part counts fail loudly
    some = next(iter(scores))
    with pytest.raises(ValueError, match="csp_scores and in"):
        flop_targeted_keep_sets(
            spec, scores, target=0.5,
            csp_scores={some: (2, np.ones(spec.layers[some].filters))})
    with pytest.raises(ValueError, match="not divisible"):
        flop_targeted_keep_sets(spec, scores, target=0.5,
                                csp_scores={1: (3, np.ones(o))})
    with pytest.raises(ValueError, match="scores"):
        flop_targeted_keep_sets(spec, scores, target=0.5,
                                csp_scores={1: (2, np.ones(3))})


def test_scheduled_fractions_cover_csp_convs():
    """Per-layer --fractions schedules now reach the CSP sources with
    split-balanced selection (the same eligibility rule as the uniform
    path); non-constrainable indices still fail loudly."""
    from modelcompression_tpu.compress import l1_filter_keep_sets_scheduled
    from modelcompression_tpu.data.fixtures import tiny_yolo4_cfg

    spec, params = _spec_params(tiny_yolo4_cfg(num_classes=3))
    keep = l1_filter_keep_sets_scheduled(params, spec, {1: 0.5},
                                         default=0.25)
    o = spec.layers[1].filters
    block = o // 2
    k1 = np.asarray(keep[1])
    assert len(k1) == o // 2
    assert int((k1 < block).sum()) == int((k1 >= block).sum())
    slim_spec, _ = repack(spec, params, keep)  # balance validated
    assert slim_spec.layers[1].filters == o // 2
    # head-producing convs still rejected
    head_conv = spec.head_indices()[0] - 1
    with pytest.raises(ValueError, match="non-prunable"):
        l1_filter_keep_sets_scheduled(params, spec, {head_conv: 0.5})


def test_prune_cli_target_flops_csp(tmp_path):
    """CLI composition on the CSP graph: prune --target-flops slims the
    grouped-route source balanced instead of protecting it, and the
    written cfg re-validates (slice divisibility) on load."""
    from modelcompression_tpu.cli import prune
    from modelcompression_tpu.data.fixtures import tiny_yolo4_cfg
    from modelcompression_tpu.models import load_cfg, save_weights

    cfg_text = tiny_yolo4_cfg(num_classes=3)
    cfg_path = str(tmp_path / "v4.cfg")
    open(cfg_path, "w").write(cfg_text)
    spec = parse_cfg(cfg_text)
    params = init_params(spec, jax.random.key(5))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    out = str(tmp_path / "slim.weights")
    out_cfg = str(tmp_path / "slim.cfg")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter", "--target-flops", "0.25",
                     "--out", out, "--out-cfg", out_cfg])
    assert rc == 0
    slim = load_cfg(out_cfg)  # parse re-validates the grouped route
    assert num_conv_flops(slim) <= 0.25 * num_conv_flops(spec)
    assert slim.layers[1].filters < spec.layers[1].filters
    assert slim.layers[1].filters % 2 == 0
