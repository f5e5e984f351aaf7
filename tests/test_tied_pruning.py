"""Group-uniform tied pruning (criteria.tied_group_keep_sets,
`prune --tied group`): the aggressive Li et al. 2017 §4.2 ResNet option —
shortcut-tied convs pruned with ONE shared keep-set per group instead of
being protected, so the residual identity paths slim too while every
[shortcut] add stays channel-aligned (repack validates the invariant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.compress import (
    channel_masks_from_keep, repack, tied_group_keep_sets,
    uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.compress.graph import tied_conv_groups
from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.data.fixtures import tiny_yolo3_cfg
from modelcompression_tpu.models import (
    forward, init_params, num_params, parse_cfg, yolov3_voc,
)


@pytest.fixture(scope="module")
def v3_fixture():
    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(0))
    return spec, params


def test_tied_groups_share_one_keep_set(v3_fixture):
    spec, params = v3_fixture
    groups = tied_conv_groups(spec)
    assert groups == [{2, 5}]  # the fixture's one residual add
    ks = tied_group_keep_sets(params, spec, 0.5)
    assert set(ks) == {2, 5}
    np.testing.assert_array_equal(ks[2], ks[5])
    # floor(0.5 * 32) dropped
    assert len(ks[2]) == 16 and spec.layers[2].filters == 32

    # group rank key = SUM of member scores filter-for-filter
    s2 = np.abs(np.asarray(params["conv2"]["w"],
                           np.float64)).sum(axis=(0, 1, 2))
    s5 = np.abs(np.asarray(params["conv5"]["w"],
                           np.float64)).sum(axis=(0, 1, 2))
    order = np.argsort(s2 + s5, kind="stable")
    np.testing.assert_array_equal(np.sort(order[16:]), ks[2])


def test_group_mode_merges_with_untied_keep_sets(v3_fixture):
    spec, params = v3_fixture
    protect = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    group = uniform_filter_fraction_keep_sets(spec, params, 0.5,
                                              tied="group")
    assert set(group) == set(protect) | {2, 5}
    for i in protect:  # untied decisions unchanged
        np.testing.assert_array_equal(group[i], protect[i])
    with pytest.raises(ValueError, match="tied"):
        uniform_filter_fraction_keep_sets(spec, params, 0.5, tied="bogus")


def test_tied_slimmed_equals_masked(v3_fixture):
    """The prize invariant: repack through a PRUNED [shortcut] (both
    addends sliced to the shared keep-set) equals the masked twin."""
    spec, params = v3_fixture
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.5,
                                             tied="group")
    new_spec, new_params = repack(spec, params, keep)
    masks = channel_masks_from_keep(spec, keep)

    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    y_masked = forward(params, x, spec, BITMATCH, channel_masks=masks)
    y_slim = forward(new_params, x, new_spec, BITMATCH)
    for a, b in zip(y_slim, y_masked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    # group mode slims strictly more than protect mode
    protect_spec, protect_params = repack(
        spec, params, uniform_filter_fraction_keep_sets(spec, params, 0.5))
    assert num_params(new_params) < num_params(protect_params) \
        < num_params(params)


def test_misaligned_tied_keep_sets_fail_loudly(v3_fixture):
    """A hand-built keep-set violating the tie must be rejected by repack
    (the validation group mode exists to satisfy)."""
    spec, params = v3_fixture
    bad = {2: np.arange(16), 5: np.arange(1, 17)}
    with pytest.raises(ValueError, match="shortcut"):
        repack(spec, params, bad)


def test_full_yolov3_group_coverage():
    """Darknet-53: group mode prunes the 5 residual stages (28 tied
    convs) on top of the 44 untied — 72 of 75 convs; only the 3 head
    producers stay protected."""
    spec = yolov3_voc()
    params = init_params(spec, jax.random.key(1))
    kp = uniform_filter_fraction_keep_sets(spec, params, 0.75)
    kg = uniform_filter_fraction_keep_sets(spec, params, 0.75,
                                           tied="group")
    assert len(kp) == 44 and len(kg) == 72
    assert len(spec.conv_indices()) == 75
    for g in tied_conv_groups(spec):
        members = sorted(g)
        for i in members[1:]:
            np.testing.assert_array_equal(kg[i], kg[members[0]])

    # the repacked graph is structurally valid (channel resolution and
    # the shortcut tie validation both pass)
    new_spec, new_params = repack(spec, params, kg)
    assert num_params(new_params) < 0.15 * num_params(params)


def test_iterative_loop_tied_group(tmp_path):
    """VERDICT r3 #4: the iterative prune->fine-tune->eval loop drives
    tied-group structured pruning (the measured-fastest v3 config),
    slimming residual identity paths WITH per-round fine-tune recovery —
    previously reachable only from the one-shot prune CLI."""
    from modelcompression_tpu.data.fixtures import make_fake_voc
    from modelcompression_tpu.data.voc import (
        load_list_dataset, read_data_cfg,
    )
    from modelcompression_tpu.train import (
        BatchLoader, TrainConfig, iterative_prune_finetune,
    )
    from modelcompression_tpu.utils.logging import MetricsLogger

    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(3))
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4,
                             image_size=64, seed=0)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    loader = BatchLoader(samples, batch_size=2, net_h=64, net_w=64,
                         max_boxes=8)
    config = TrainConfig.from_spec(spec, augment_jitter=0.0, max_boxes=8)

    def eval_fn(s, p):
        return {"n_params": num_params(p)}

    rounds = iterative_prune_finetune(
        spec, params, config, loader, fractions=[0.5],
        steps_per_round=2, eval_fn=eval_fn, mode="l1_filter",
        logger=MetricsLogger(print_every=0), tied="group")
    slim = rounds[-1].spec
    # the tied group {2,5} is slimmed (protect mode would keep 32)
    assert slim.layers[2].filters == 16
    assert slim.layers[5].filters == 16
    assert num_params(rounds[-1].params) < num_params(params)

    # invalid compositions fail loudly, not silently fall through
    with pytest.raises(ValueError, match="tied"):
        iterative_prune_finetune(
            spec, params, config, loader, fractions=[0.5],
            steps_per_round=1, eval_fn=eval_fn, mode="magnitude",
            logger=MetricsLogger(print_every=0), tied="group")


def test_finetune_cli_rejects_bad_tied_compositions(tmp_path):
    from modelcompression_tpu.cli import finetune as ft_cli
    from modelcompression_tpu.data.fixtures import make_fake_voc
    from modelcompression_tpu.models import dump_cfg, save_weights

    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(4))
    cfg_path = str(tmp_path / "v3.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp_path / "v3.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=2,
                             image_size=64, seed=0)
    base = ["--cfg", cfg_path, "--weights", wpath, "--data", data_cfg,
            "--steps", "1", "--out", str(tmp_path / "o.weights")]
    # --tied group without --iterate
    assert ft_cli.main(base + ["--tied", "group"]) == 2
    # --tied group with a masked iterate mode
    assert ft_cli.main(base + ["--tied", "group", "--iterate", "0.5",
                               "--iterate-mode", "magnitude"]) == 2


def test_prune_cli_tied_group(tmp_path):
    from modelcompression_tpu.cli import prune as prune_cli
    from modelcompression_tpu.models import dump_cfg, save_weights

    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(2))
    cfg_path = str(tmp_path / "v3.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp_path / "v3.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    out = str(tmp_path / "slim.weights")

    rc = prune_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--mode", "l1_filter", "--fraction", "0.5",
                         "--tied", "group", "--out", out])
    assert rc == 0
    slim_spec = parse_cfg(open(str(tmp_path / "slim.cfg")).read())
    assert slim_spec.layers[2].filters == 16  # tied group slimmed

    # --tied group must not silently fall through on unsupported paths
    rc = prune_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--mode", "l1_filter", "--fractions", "0:0.5",
                         "--tied", "group", "--out", out])
    assert rc == 2
