"""Pipeline integration tests (SURVEY.md §4.5): fake-VOC fixture driving
loader -> train loop -> checkpoint save/restore -> iterative
prune->finetune->eval, minutes on CPU."""


import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.data.fixtures import (
    make_fake_voc, tiny_region_cfg,
)
from modelcompression_tpu.data.voc import load_list_dataset, read_data_cfg
from modelcompression_tpu.models import init_params, parse_cfg, num_params
from modelcompression_tpu.train import (
    BatchLoader, TrainConfig, TrainState, iterative_prune_finetune,
    make_optimizer, make_train_step, train,
)
from modelcompression_tpu.utils.checkpoint import (
    latest_checkpoint, load_checkpoint, save_checkpoint,
)
from modelcompression_tpu.utils.logging import MetricsLogger


def setup(tmp_path, n_images=6, img=96, net=64):
    data_cfg = make_fake_voc(str(tmp_path / "data"), n_images=n_images,
                             image_size=img, seed=0)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=net, height=net))
    params = init_params(spec, jax.random.key(0))
    config = TrainConfig.from_spec(spec)
    return spec, params, config, samples


def test_loader_shapes_and_boxes(tmp_path):
    spec, params, config, samples = setup(tmp_path)
    loader = BatchLoader(samples, batch_size=4, net_h=64, net_w=64,
                         max_boxes=10, seed=1)
    images, targets = next(iter(loader))
    assert images.shape == (4, 64, 64, 3) and images.dtype == np.uint8
    assert targets.shape == (4, 10, 5)
    valid = targets[targets[..., 3] > 0]
    assert len(valid) > 0
    # normalized boxes within frame
    assert (valid[:, 1:] >= 0).all() and (valid[:, 1:] <= 1).all()
    assert loader.batches_per_epoch() == 1


def test_train_loop_runs_and_logs(tmp_path):
    spec, params, config, samples = setup(tmp_path)
    loader = BatchLoader(samples, batch_size=4, net_h=64, net_w=64,
                         max_boxes=10)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(1))
    jsonl = str(tmp_path / "log" / "metrics.jsonl")
    logger = MetricsLogger(jsonl_path=jsonl, print_every=0)
    # metrics_every=1 -> one JSONL record per step (the default of 10 only
    # syncs metrics to host every 10th step to avoid per-step readbacks)
    state = train(state, spec, config, loader, n_steps=4, logger=logger,
                  metrics_every=1)
    assert int(state["step"]) == 4
    lines = open(jsonl).read().strip().splitlines()
    assert len(lines) == 4
    import json
    rec = json.loads(lines[-1])
    assert "loss" in rec and "img_per_sec" in rec and rec["step"] == 4
    # default cadence: only the final step forces a sync within 4 steps
    jsonl2 = str(tmp_path / "log" / "metrics2.jsonl")
    state = train(state, spec, config, loader, n_steps=4,
                  logger=MetricsLogger(jsonl_path=jsonl2, print_every=0))
    assert len(open(jsonl2).read().strip().splitlines()) == 1


def test_checkpoint_roundtrip(tmp_path):
    spec, params, config, samples = setup(tmp_path)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(2))
    loader = BatchLoader(samples, batch_size=2, net_h=64, net_w=64,
                         max_boxes=10)
    state = train(state, spec, config, loader, n_steps=2,
                  logger=MetricsLogger(print_every=0))
    ckdir = save_checkpoint(str(tmp_path / "ck"), int(state["step"]), spec,
                            dict(state), extra={"note": "test"})
    assert latest_checkpoint(str(tmp_path / "ck")) == ckdir
    # target-guided restore: rebuilds optax container types
    target = TrainState.create(init_params(spec, jax.random.key(9)), tx,
                               jax.random.key(9))
    spec2, state2, meta = load_checkpoint(ckdir, target=target)
    assert meta["step"] == 2 and meta["note"] == "test"
    assert len(spec2.layers) == len(spec.layers)
    for k, p in state["params"].items():
        for n, v in p.items():
            np.testing.assert_array_equal(np.asarray(v),
                                          state2["params"][k][n])
    # resume: restored state drives more steps
    state3 = train(TrainState(state2), spec2, config, loader, n_steps=1,
                   logger=MetricsLogger(print_every=0))
    assert int(state3["step"]) == 3


def test_iterative_prune_finetune_l1(tmp_path):
    spec, params, config, samples = setup(tmp_path)
    loader = BatchLoader(samples, batch_size=2, net_h=64, net_w=64,
                         max_boxes=10)
    n0 = num_params(params)

    def eval_fn(s, p):
        return {"map50": 0.0, "n_params": num_params(p)}

    rounds = iterative_prune_finetune(
        spec, params, config, loader, fractions=[0.25, 0.5],
        steps_per_round=2, eval_fn=eval_fn, mode="l1_filter",
        logger=MetricsLogger(print_every=0))
    assert len(rounds) == 2
    n1 = num_params(rounds[0].params)
    n2 = num_params(rounds[1].params)
    assert n2 < n1 < n0
    # round 2's spec has ~50% of original filters in prunable convs
    from modelcompression_tpu.models.cfg import ConvLayer
    convs0 = [l.filters for l in spec.layers if isinstance(l, ConvLayer)]
    convs2 = [l.filters for l in rounds[1].spec.layers
              if isinstance(l, ConvLayer)]
    assert convs2[-1] == convs0[-1]  # detection conv protected
    assert convs2[0] == convs0[0] // 2


def test_multi_scale_loader_and_train(tmp_path):
    """Darknet random-resize training (cfg random=1): the loader redraws
    the net size every resize_every batches; the jitted step recompiles per
    size and trains across them."""
    spec, params, config, samples = setup(tmp_path)
    loader = BatchLoader(samples, batch_size=2, net_h=64, net_w=64,
                         max_boxes=10, seed=3, multi_scale=(32, 96),
                         resize_every=1)
    it = iter(loader)
    sizes = set()
    batches = []
    for _ in range(6):
        images, targets = next(it)
        sizes.add(images.shape[1])
        batches.append((images, targets))
    assert len(sizes) >= 2, sizes
    assert all(s % 32 == 0 for s in sizes)

    import dataclasses
    cfg = dataclasses.replace(config, augment_jitter=0.2)
    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx, jax.random.key(4))
    step = make_train_step(spec, cfg, tx)
    for images, targets in batches[:3]:
        state, m = step(state, jnp.asarray(images), jnp.asarray(targets))
        assert np.isfinite(float(m["loss"]))
    assert int(state["step"]) == 3


def test_iterative_checkpoint_resume(tmp_path):
    """Round checkpoints: a run that completed round 0 resumes straight
    into round 1 with the slimmed spec/params restored (SURVEY.md §5.3)."""
    spec, params, config, samples = setup(tmp_path)
    loader = BatchLoader(samples, batch_size=2, net_h=64, net_w=64,
                         max_boxes=10)
    ckdir = str(tmp_path / "rounds")

    def eval_fn(s, p):
        return {"map50": 0.0, "n_params": float(num_params(p))}

    # "interrupted" run: only round 0 executes
    first = iterative_prune_finetune(
        spec, params, config, loader, fractions=[0.25],
        steps_per_round=2, eval_fn=eval_fn, mode="l1_filter",
        logger=MetricsLogger(print_every=0), ckpt_dir=ckdir)
    assert len(first) == 1

    # resume with the full schedule: round 0 must be skipped
    resumed = iterative_prune_finetune(
        spec, params, config, loader, fractions=[0.25, 0.5],
        steps_per_round=2, eval_fn=eval_fn, mode="l1_filter",
        logger=MetricsLogger(print_every=0), ckpt_dir=ckdir, resume=True)
    assert len(resumed) == 1 and resumed[0].round_idx == 1
    # resumed round pruned the RESTORED slimmed model further
    n0 = num_params(first[0].params)
    n1 = num_params(resumed[0].params)
    assert n1 < n0
    from modelcompression_tpu.models.cfg import ConvLayer
    convs0 = [l.filters for l in spec.layers if isinstance(l, ConvLayer)]
    convs1 = [l.filters for l in resumed[0].spec.layers
              if isinstance(l, ConvLayer)]
    assert convs1[0] == convs0[0] // 2  # cumulative 50% of original


def test_iterative_magnitude_masks(tmp_path):
    spec, params, config, samples = setup(tmp_path)
    loader = BatchLoader(samples, batch_size=2, net_h=64, net_w=64,
                         max_boxes=10)

    def eval_fn(s, p):
        return {"map50": 0.0}

    rounds = iterative_prune_finetune(
        spec, params, config, loader, fractions=[0.5, 0.9],
        steps_per_round=2, eval_fn=eval_fn, mode="magnitude",
        logger=MetricsLogger(print_every=0))
    # final params have >= 90% zeros in conv weights
    total = zeros = 0
    for p in rounds[-1].params.values():
        w = np.asarray(p["w"])
        total += w.size
        zeros += int((w == 0).sum())
    assert zeros / total >= 0.89
