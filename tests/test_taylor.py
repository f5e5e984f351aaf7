"""Taylor-expansion filter criterion (Molchanov et al. 2017) —
compress/taylor.py: gate-gradient scores, keep-set selection, CLI and
iterative-loop wiring."""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.compress import (
    keep_sets_from_scores, repack, taylor_filter_keep_sets,
    taylor_filter_scores_device, taylor_gate_indices,
)
from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.data.fixtures import make_fake_voc, tiny_region_cfg
from modelcompression_tpu.models import forward, init_params, parse_cfg
from modelcompression_tpu.models.darknet import conv_key
from modelcompression_tpu.train.region_loss import region_loss


def _spec():
    return parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))


def _batch(spec, rng, b=2, m=4):
    """A synthetic (uint8 images, padded targets) batch."""
    images = rng.integers(0, 256, (b, spec.net.height, spec.net.width, 3),
                          dtype=np.uint8)
    targets = np.zeros((b, m, 5), np.float32)
    for bi in range(b):
        for j in range(2):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.2, 0.4, 2)
            targets[bi, j] = [rng.integers(0, 3), cx, cy, w, h]
    return images, targets


def test_scores_cover_prunable_convs_and_normalize():
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    rng = np.random.default_rng(0)
    scores = taylor_filter_scores_device(params, spec,
                                         [_batch(spec, rng)], seen=20000)
    conv_idx = spec.conv_indices()
    assert set(scores) == set(taylor_gate_indices(spec))
    assert conv_idx[-1] not in scores  # detection conv protected
    for i, s in scores.items():
        assert s.shape == (spec.layers[i].filters,)
        assert np.all(s >= 0)
        # layer-wise L2 normalization (Molchanov sect. 3.3)
        np.testing.assert_allclose(np.linalg.norm(s), 1.0, rtol=1e-5)


def test_gate_gradient_equals_activation_taylor_term():
    """The criterion's definition is theta_j = |sum_{b,h,w} a_j * dL/da_j|
    (Molchanov eq. 7). Verify the gate-gradient shortcut against an
    explicit activation capture: split the network after the first conv's
    activation ``a``, compute dL/da with autodiff through the remainder,
    and contract with ``a`` by hand.

    (Finite differences are NOT a valid oracle here: the region loss holds
    rescore-IoU targets behind stop_gradient and flips anchor assignments
    discretely, so the true directional derivative differs from the
    training gradient by design.)
    """
    from modelcompression_tpu.models.cfg import (
        ConvLayer, MaxPoolLayer, RegionLayer,
    )
    from modelcompression_tpu.models.darknet import conv_bn_act, maxpool

    spec = _spec()
    params = init_params(spec, jax.random.key(1))
    rng = np.random.default_rng(1)
    images, targets = _batch(spec, rng)
    seen = jnp.asarray(20000, jnp.int32)
    i0 = taylor_gate_indices(spec)[0]
    assert i0 == 0 and isinstance(spec.layers[0], ConvLayer)

    x = jnp.asarray(images).astype(jnp.float32) / 255.0
    a = conv_bn_act(x, params[conv_key(0)], spec.layers[0], BITMATCH,
                    train_stats=True)

    @jax.jit
    def loss_from_a(a):
        y = a
        for i in range(1, len(spec.layers)):
            l = spec.layers[i]
            if isinstance(l, ConvLayer):
                y = conv_bn_act(y, params[conv_key(i)], l, BITMATCH,
                                train_stats=True)
            elif isinstance(l, MaxPoolLayer):
                y = maxpool(y, l)
            else:
                assert isinstance(l, RegionLayer)
        return region_loss(y.astype(jnp.float32), jnp.asarray(targets),
                           spec.region, seen).loss

    da = jax.grad(loss_from_a)(a)
    manual = np.abs(np.asarray(jnp.sum(a * da, axis=(0, 1, 2))))
    manual = manual / np.linalg.norm(manual)

    scores = taylor_filter_scores_device(params, spec, [(images, targets)],
                                         seen=20000)
    # two separately-jitted f32 programs fuse differently; agreement is to
    # f32 noise, not bit-exact
    np.testing.assert_allclose(scores[i0], manual, rtol=2e-3, atol=2e-5)


def test_second_moment_is_squared_first_moment_on_one_batch():
    """With a single batch the 2019 squared importance is exactly the
    square of the 2017 |grad| (before normalization) — so normalized
    scores relate by x -> x^2/||.||, and ranks are identical."""
    spec = _spec()
    params = init_params(spec, jax.random.key(7))
    rng = np.random.default_rng(7)
    batch = _batch(spec, rng)
    s1 = taylor_filter_scores_device(params, spec, [batch], seen=20000)
    s2 = taylor_filter_scores_device(params, spec, [batch], seen=20000,
                                     second_moment=True)
    for i in s1:
        sq = s1[i] ** 2
        np.testing.assert_allclose(s2[i], sq / np.linalg.norm(sq),
                                   rtol=2e-3, atol=1e-6)
        assert np.array_equal(np.argsort(s1[i], kind="stable"),
                              np.argsort(s2[i], kind="stable"))


def test_dead_filter_scores_zero():
    """A filter whose output is identically zero contributes nothing to
    the loss — its Taylor score sum(a * dL/da) must be exactly 0."""
    spec = _spec()
    params = init_params(spec, jax.random.key(2))
    i0 = taylor_gate_indices(spec)[0]
    k = conv_key(i0)
    dead = [0, 3]
    w = np.array(params[k]["w"])
    w[..., dead] = 0.0  # conv out 0 -> batch stats 0 -> BN out = beta = 0
    params[k]["w"] = jnp.asarray(w)
    beta = np.array(params[k]["beta"])
    beta[dead] = 0.0
    params[k]["beta"] = jnp.asarray(beta)
    rng = np.random.default_rng(2)
    scores = taylor_filter_scores_device(params, spec,
                                         [_batch(spec, rng)], seen=20000)
    assert np.all(scores[i0][dead] == 0.0)
    assert np.any(scores[i0] > 0)


def test_keep_sets_repack_and_forward():
    spec = _spec()
    params = init_params(spec, jax.random.key(3))
    rng = np.random.default_rng(3)
    batches = [_batch(spec, rng) for _ in range(2)]
    keep = taylor_filter_keep_sets(params, spec, batches, 0.5, seen=20000)
    for i, kset in keep.items():
        n = spec.layers[i].filters
        assert kset.shape == (n - n // 2,)
        assert np.all(np.diff(kset) > 0)  # sorted, unique
    slim_spec, slim_params = repack(spec, params, keep)
    x = jnp.asarray(batches[0][0]).astype(jnp.float32) / 255.0
    y = forward(slim_params, x, slim_spec, BITMATCH)
    hw = spec.net.height // 32
    assert y.shape == (x.shape[0], hw, hw, 5 * (5 + 3))


def test_taylor_tied_group_scores_and_keep_sets():
    """Round 4: the Taylor criterion composes with tied groups — gate
    gradients are measured on tied members too (gating is measurement,
    not pruning), the group score is the L2-normalized SUM of the member
    gate gradients, and tied='group' keep-sets stay group-aligned
    through repack."""
    from modelcompression_tpu.compress import taylor_scores_with_groups
    from modelcompression_tpu.data.fixtures import tiny_yolo3_cfg
    from modelcompression_tpu.models import num_params

    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(1))
    rng = np.random.default_rng(1)
    batches = [_batch(spec, rng), _batch(spec, rng)]

    untied, groups = taylor_scores_with_groups(params, spec, list(batches),
                                               seen=20000)
    assert set(groups) == {(2, 5)}
    assert set(untied) == set(taylor_gate_indices(spec))
    s = groups[(2, 5)]
    assert s.shape == (spec.layers[2].filters,)
    np.testing.assert_allclose(np.linalg.norm(s), 1.0, rtol=1e-5)
    assert np.all(s >= 0)

    keep = taylor_filter_keep_sets(params, spec, list(batches), 0.5,
                                   seen=20000, tied="group")
    np.testing.assert_array_equal(keep[2], keep[5])
    assert len(keep[2]) == spec.layers[2].filters // 2
    slim_spec, slim_params = repack(spec, params, keep)
    assert slim_spec.layers[2].filters == spec.layers[2].filters // 2
    assert num_params(slim_params) < num_params(params)

    # protect mode unchanged: tied convs absent from the keep map
    keep_p = taylor_filter_keep_sets(params, spec, list(batches), 0.5,
                                     seen=20000)
    assert 2 not in keep_p and 5 not in keep_p
    with pytest.raises(ValueError, match="tied"):
        taylor_filter_keep_sets(params, spec, list(batches), 0.5,
                                tied="bogus")


def test_keep_sets_from_scores_schedule():
    scores = {0: np.asarray([3.0, 1.0, 2.0, 0.5]),
              2: np.asarray([1.0, 2.0])}
    keep = keep_sets_from_scores(scores, fractions={0: 0.5}, default=0.0)
    assert keep[0].tolist() == [0, 2]  # dropped the two lowest
    assert keep[2].tolist() == [0, 1]  # default 0: keep all
    with pytest.raises(ValueError):
        keep_sets_from_scores(scores, fractions={7: 0.5})
    with pytest.raises(ValueError):
        keep_sets_from_scores(scores)


def test_empty_batches_raise():
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    with pytest.raises(ValueError, match="at least one batch"):
        taylor_filter_scores_device(params, spec, [])


def test_prune_cli_taylor_mode(tmp_path):
    from modelcompression_tpu.cli.prune import main as prune_main
    from modelcompression_tpu.models import load_cfg, load_weights

    spec = _spec()
    cfg_path = tmp_path / "tiny.cfg"
    cfg_path.write_text(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(4))
    from modelcompression_tpu.models import save_weights
    w_path = tmp_path / "init.weights"
    save_weights(str(w_path), spec,
                 jax.tree.map(np.asarray, params), seen=0)
    data = make_fake_voc(str(tmp_path / "voc"), n_images=4, image_size=64)

    out = tmp_path / "taylor.weights"
    rc = prune_main(["--cfg", str(cfg_path), "--weights", str(w_path),
                     "--mode", "taylor", "--fraction", "0.5",
                     "--data", data, "--score-batches", "2",
                     "--batch", "2", "--out", str(out)])
    assert rc == 0
    out_cfg = tmp_path / "taylor.cfg"
    assert out.exists() and out_cfg.exists()
    slim_spec = load_cfg(str(out_cfg))
    slim_params, _ = load_weights(str(out), slim_spec)
    y = forward(jax.tree.map(jnp.asarray, slim_params),
                jnp.zeros((1, 64, 64, 3)), slim_spec, BITMATCH)
    assert y.shape[-1] == 5 * (5 + 3)
    # half the first conv's filters are gone
    first = slim_spec.conv_indices()[0]
    assert slim_spec.layers[first].filters == \
        spec.layers[first].filters // 2

    # taylor without --data is a usage error, not a traceback
    rc = prune_main(["--cfg", str(cfg_path), "--weights", str(w_path),
                     "--mode", "taylor", "--fraction", "0.5",
                     "--out", str(tmp_path / "x.weights")])
    assert rc == 2


def test_finetune_cli_iterate_taylor(tmp_path):
    """finetune --iterate-mode taylor --taylor-batches through the public
    CLI surface: one round, physically repacked output + rewritten cfg."""
    from modelcompression_tpu.cli import finetune
    from modelcompression_tpu.models import load_cfg, save_weights
    from modelcompression_tpu.models.cfg import ConvLayer

    spec = _spec()
    cfg_path = str(tmp_path / "tiny.cfg")
    open(cfg_path, "w").write(
        tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(6))
    w_path = str(tmp_path / "init.weights")
    save_weights(w_path, spec, jax.tree.map(np.asarray, params), seen=0)
    data = make_fake_voc(str(tmp_path / "voc"), n_images=4, image_size=64)

    out = str(tmp_path / "slim.weights")
    out_cfg = str(tmp_path / "slim.cfg")
    rc = finetune.main([
        "--cfg", cfg_path, "--weights", w_path, "--data", data,
        "--steps", "2", "--batch", "2", "--max-boxes", "8",
        "--iterate", "0.25", "--iterate-mode", "taylor",
        "--taylor-batches", "2", "--out", out, "--out-cfg", out_cfg,
    ])
    assert rc == 0
    assert os.path.exists(out) and os.path.exists(out_cfg)
    slim = load_cfg(out_cfg)
    convs = [l for l in slim.layers if isinstance(l, ConvLayer)]
    orig = [l for l in spec.layers if isinstance(l, ConvLayer)]
    assert convs[-1].filters == orig[-1].filters  # detection conv protected
    assert sum(c.filters for c in convs) < sum(c.filters for c in orig)


def test_iterative_loop_taylor_mode(tmp_path):
    from modelcompression_tpu.cli.common import load_train_dataset
    from modelcompression_tpu.train import (
        TrainConfig, iterative_prune_finetune,
    )
    from modelcompression_tpu.train.loader import BatchLoader

    spec = _spec()
    params = init_params(spec, jax.random.key(5))
    data = make_fake_voc(str(tmp_path / "voc"), n_images=4, image_size=64)

    class Args:
        pass

    args = Args()
    args.data = data
    samples, _ = load_train_dataset(args)
    loader = BatchLoader(samples, 2, 64, 64, max_boxes=4, seed=0)
    config = TrainConfig(learning_rate=1e-4, policy="constant",
                         precision=BITMATCH)
    rounds = iterative_prune_finetune(
        spec, params, config, loader, fractions=[0.25, 0.5],
        steps_per_round=2,
        eval_fn=lambda s, p: {"map50": 0.0},
        mode="taylor", taylor_batches=2)
    assert len(rounds) == 2
    # each round physically repacked: filter counts shrank monotonically
    first = spec.conv_indices()[0]
    n0 = spec.layers[first].filters
    n1 = rounds[0].spec.layers[first].filters
    n2 = rounds[1].spec.layers[first].filters
    assert n0 > n1 > n2
