"""Darknet ``subdivisions`` gradient accumulation (SURVEY.md §5.6;
VERDICT r1 #3): one jitted step scans S micro-batches, accumulating
gradients into ONE optimizer update, so the shipped cfgs train at
Darknet's effective batch and ``seen``/LR ``steps=`` count weight
updates.

Equality contract: with BN out of the picture the accumulated step is
EXACTLY one big-batch step (the region loss is sum/batch, so averaging
per-micro gradients reproduces the big-batch gradient); with BN, batch
statistics are per-micro-batch and running stats advance once per micro
forward in order — Darknet's semantics, pinned against an unrolled
reference here."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.train import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)
from modelcompression_tpu.train.train_step import (
    BN_MOMENTUM, _forward_train, split_trainable,
)

from tests.conftest import cpu_devices


def _setup(bn: bool, seed=0, w=64):
    txt = tiny_region_cfg(num_classes=3, width=w, height=w)
    if not bn:
        txt = txt.replace("batch_normalize=1", "batch_normalize=0")
    spec = parse_cfg(txt)
    params = init_params(spec, jax.random.key(seed))
    config = TrainConfig.from_spec(spec, augment_flip=False,
                                   augment_jitter=0.0, precision=BITMATCH)
    return spec, params, config


def _batch(b=4, w=64, m=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (b, w, w, 3), dtype=np.uint8)
    targets = np.zeros((b, m, 5), np.float32)
    for i in range(b):
        targets[i, 0] = [rng.integers(0, 3), 0.5, 0.5, 0.4, 0.4]
    return jnp.asarray(images), jnp.asarray(targets)


def _fresh(params):
    return jax.tree.map(lambda v: jnp.asarray(np.asarray(v)), params)


def test_accumulated_step_equals_bigbatch_without_bn():
    """S=2 accumulation == one big-batch step exactly (no BN): same loss,
    same updated params (up to fp reassociation of the two half-sums)."""
    spec, params, config = _setup(bn=False, seed=1)
    images, targets = _batch(b=4, seed=1)
    out = {}
    for name, s in (("big", 1), ("accum", 2)):
        cfg = dataclasses.replace(config, subdivisions=s)
        tx = make_optimizer(cfg)
        st = TrainState.create(_fresh(params), tx, jax.random.key(2))
        st, m = make_train_step(spec, cfg, tx)(st, images, targets)
        out[name] = (float(m["loss"]), st)
    assert out["big"][0] == pytest.approx(out["accum"][0], rel=1e-6)
    for k in out["big"][1]["params"]:
        for n, v in out["big"][1]["params"][k].items():
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(out["accum"][1]["params"][k][n]),
                rtol=1e-5, atol=1e-7, err_msg=f"{k}/{n}")


def test_counters_count_effective_batches():
    """One accumulated step = ONE weight update: step +1, seen += the
    EFFECTIVE batch — the units Darknet's LR steps= schedule counts."""
    spec, params, config = _setup(bn=True, seed=2)
    cfg = dataclasses.replace(config, subdivisions=2)
    tx = make_optimizer(cfg)
    st = TrainState.create(params, tx, jax.random.key(3))
    images, targets = _batch(b=4, seed=2)
    st, _ = make_train_step(spec, cfg, tx)(st, images, targets)
    assert int(st["step"]) == 1
    assert int(st["seen"]) == 4


def test_bn_running_stats_follow_darknet_pacing():
    """With S=2 the BN running stats advance once per micro-batch forward,
    in order, each micro normalizing with its OWN batch statistics.
    Micro-batch s takes the strided elements {s, S+s, ...} (so DP shards
    stay balanced) — the unrolled reference here mirrors that."""
    spec, params, config = _setup(bn=True, seed=3)
    cfg = dataclasses.replace(config, subdivisions=2)
    tx = make_optimizer(cfg)
    st = TrainState.create(_fresh(params), tx, jax.random.key(4))
    images, targets = _batch(b=4, seed=3)
    st, _ = make_train_step(spec, cfg, tx)(st, images, targets)

    x = images.astype(jnp.float32) / 255.0
    _, stats0 = split_trainable(params)
    expected = {k: dict(v) for k, v in stats0.items()}
    for s in (0, 1):  # stride partition: micro0 = rows {0, 2}, micro1 = {1, 3}
        xi = x[s::2]
        _, bs = _forward_train(params, xi, spec, cfg.precision, {})
        for k, b in bs.items():
            expected[k]["mean"] = (1 - BN_MOMENTUM) * expected[k]["mean"] \
                + BN_MOMENTUM * b["mean"]
            expected[k]["var"] = (1 - BN_MOMENTUM) * expected[k]["var"] \
                + BN_MOMENTUM * b["var"]
    checked = 0
    for k, v in expected.items():
        if "mean" not in v:
            continue
        np.testing.assert_allclose(np.asarray(st["params"][k]["mean"]),
                                   np.asarray(v["mean"]), rtol=1e-5,
                                   atol=1e-6, err_msg=f"{k}/mean")
        np.testing.assert_allclose(np.asarray(st["params"][k]["var"]),
                                   np.asarray(v["var"]), rtol=1e-5,
                                   atol=1e-6, err_msg=f"{k}/var")
        checked += 1
    assert checked > 0

    # and per-micro stats differ from big-batch stats (the semantics the
    # test exists to pin — otherwise this test could pass vacuously)
    _, bs_big = _forward_train(params, x, spec, cfg.precision, {})
    k0 = next(k for k in bs_big)
    big = (1 - BN_MOMENTUM) ** 2 * np.asarray(stats0[k0]["mean"]) \
        + (1 - (1 - BN_MOMENTUM) ** 2) * np.asarray(bs_big[k0]["mean"])
    assert not np.allclose(big, np.asarray(st["params"][k0]["mean"]),
                           rtol=1e-6)


def test_indivisible_batch_rejected():
    spec, params, config = _setup(bn=True, seed=4)
    cfg = dataclasses.replace(config, subdivisions=3)
    tx = make_optimizer(cfg)
    st = TrainState.create(params, tx, jax.random.key(5))
    images, targets = _batch(b=4, seed=4)
    with pytest.raises(ValueError, match="subdivisions"):
        make_train_step(spec, cfg, tx)(st, images, targets)


def test_dp_sharded_accumulated_step_matches_single_device():
    """The strided micro-batch split keeps every micro-batch evenly
    sharded over 'data': the accumulated step on an 8-CPU mesh must equal
    the single-device accumulated step."""
    spec, params, config = _setup(bn=True, seed=5, w=32)
    cfg = dataclasses.replace(config, subdivisions=2)
    tx = make_optimizer(cfg)
    images, targets = _batch(b=16, w=32, seed=5)

    state1 = TrainState.create(_fresh(params), tx, jax.random.key(6))
    step_fn = make_train_step(spec, cfg, tx)
    state1, m1 = step_fn(state1, images, targets)

    mesh = Mesh(np.array(cpu_devices()), ("data",))
    state2 = jax.device_put(
        TrainState.create(_fresh(params), tx, jax.random.key(6)),
        NamedSharding(mesh, P()))
    images_s = jax.device_put(
        images, NamedSharding(mesh, P("data", None, None, None)))
    targets_s = jax.device_put(
        targets, NamedSharding(mesh, P("data", None, None)))
    state2, m2 = make_train_step(spec, cfg, tx)(state2, images_s, targets_s)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for k in state1["params"]:
        for n, v in state1["params"][k].items():
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(state2["params"][k][n]),
                rtol=2e-4, atol=1e-5, err_msg=f"{k}/{n}")


def test_train_cli_subdivisions(tmp_path):
    """The train CLI defaults to the cfg's effective batch/subdivisions
    and rejects indivisible combinations up front."""
    from modelcompression_tpu.cli import train as train_cli
    from modelcompression_tpu.data.fixtures import make_fake_voc
    from modelcompression_tpu.models import save_weights

    txt = tiny_region_cfg(num_classes=3, width=64, height=64)
    txt = txt.replace("batch=4\nsubdivisions=1", "batch=4\nsubdivisions=2")
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(txt)
    spec = parse_cfg(txt)
    assert spec.net.subdivisions == 2
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec,
                 jax.tree.map(np.asarray, init_params(spec,
                                                      jax.random.key(0))),
                 seen=0)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=9)
    # default: cfg batch=4 / subdivisions=2 (micro-batch 2)
    rc = train_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--data", data_cfg, "--steps", "1",
                         "--max-boxes", "8"])
    assert rc == 0
    rc = train_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--data", data_cfg, "--steps", "1",
                         "--batch", "3", "--subdivisions", "2",
                         "--max-boxes", "8"])
    assert rc == 2
    # an explicit --batch WITHOUT --subdivisions overrides the cfg's
    # micro-batching entirely (one forward) — the pre-round-2 CLI shape
    rc = train_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--data", data_cfg, "--steps", "1",
                         "--batch", "3", "--max-boxes", "8"])
    assert rc == 0


def test_resolve_batch_subdivisions_rejects_explicit_zero():
    """Explicit --batch 0 / --subdivisions 0 must error, not silently
    fall back to the cfg values (falsy-zero review finding)."""
    import argparse

    from modelcompression_tpu.cli.common import resolve_batch_subdivisions

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    spec.net.batch, spec.net.subdivisions = 8, 2

    def ns(batch=None, subdivisions=None):
        return argparse.Namespace(batch=batch, subdivisions=subdivisions)

    assert resolve_batch_subdivisions(ns(), spec) == (8, 2)
    assert resolve_batch_subdivisions(ns(batch=4), spec) == (4, 1)
    assert resolve_batch_subdivisions(ns(batch=4, subdivisions=2),
                                      spec) == (4, 2)
    assert resolve_batch_subdivisions(ns(subdivisions=4), spec) == (8, 4)
    with pytest.raises(ValueError):
        resolve_batch_subdivisions(ns(subdivisions=0), spec)
    with pytest.raises(ValueError):
        resolve_batch_subdivisions(ns(batch=0), spec)
    with pytest.raises(ValueError):
        resolve_batch_subdivisions(ns(batch=4, subdivisions=3), spec)
