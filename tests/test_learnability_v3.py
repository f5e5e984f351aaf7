"""Accuracy evidence for the SECOND detector family (YOLOv3): the same
learnable-fixture substitute for the <=2-mAP-drop contract that
tests/test_learnability.py establishes for YOLOv2 (SURVEY.md §7.5 — no
real VOC or pretrained weights exist in this environment).

1. the multi-head [yolo] training stack LEARNS — the 2-scale FPN fixture
   net overfits the colored-boxes task to high mAP@50, and
2. the reference workflow holds on the v3 graph — graph-protected
   L1-filter prune + physical repack (shortcut ties, head producers)
   drops accuracy, fine-tune recovers it on the slimmed model.

Deterministic: fixed dataset seed, loader seed, PRNG keys, CPU backend
(conftest).
"""

import jax
import jax.numpy as jnp
import pytest

from modelcompression_tpu.compress import (
    repack, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.data.fixtures import (
    FIXTURE_CLASSES, make_fake_voc, tiny_yolo3_cfg,
)
from modelcompression_tpu.data.voc import load_list_dataset, read_data_cfg
from modelcompression_tpu.evaluation import EvalConfig, evaluate
from modelcompression_tpu.models import init_params, num_params, parse_cfg
from modelcompression_tpu.train import (
    BatchLoader, TrainConfig, TrainState, make_optimizer, make_train_step,
)

EVAL_CFG = EvalConfig(batch_size=8, conf_thresh=0.005, max_detections=20)


def _train(spec, params, samples, n_steps, seed=1, **cfg_overrides):
    config = TrainConfig.from_spec(spec, augment_flip=False,
                                   augment_jitter=0.0, max_boxes=8,
                                   **cfg_overrides)
    loader = BatchLoader(samples, batch_size=8, net_h=96, net_w=96,
                         max_boxes=8, seed=seed)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(seed))
    step = make_train_step(spec, config, tx)
    it = iter(loader)
    first = None
    for i in range(n_steps):
        imgs, tgts = next(it)
        state, m = step(state, jnp.asarray(imgs), jnp.asarray(tgts))
        if i == 0:
            first = float(m["loss"])
    return state["params"], first, float(m["loss"])


def _map50(spec, params, samples):
    return evaluate(params, spec, samples, FIXTURE_CLASSES,
                    EVAL_CFG).map50


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("learnfix_v3")
    data_cfg = make_fake_voc(str(root), n_images=16, image_size=96, seed=0)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3, width=96, height=96))
    params = init_params(spec, jax.random.key(0))
    params, first_loss, last_loss = _train(spec, params, samples, 600)
    return spec, params, samples, first_loss, last_loss


def test_v3_fixture_task_learns_to_high_map(trained):
    spec, params, samples, first_loss, last_loss = trained
    assert last_loss < first_loss * 0.1
    m = _map50(spec, params, samples)
    assert m >= 0.8, f"v3 fixture mAP@50 {m:.3f}"


def test_v3_prune_finetune_recovers_map(trained):
    """50% L1-filter prune under the v3 protection rule (shortcut-tied +
    head-producing convs kept), physical repack, fine-tune on the
    SLIMMED graph."""
    spec, params, samples, *_ = trained
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    slim_spec, slim_params = repack(spec, params, keep)
    assert num_params(slim_params) < num_params(params)

    slim_params, _, _ = _train(slim_spec, slim_params, samples, 300,
                               seed=2)
    m = _map50(slim_spec, slim_params, samples)
    assert m >= 0.7, f"v3 slimmed+finetuned mAP@50 {m:.3f}"


def test_v3_tied_group_prune_finetune_recovers_map(trained):
    """The accuracy substitute for the measured-fastest v3 config
    (VERDICT r3 #4): tied-GROUP structured pruning — residual identity
    paths slimmed with one shared keep-set per [shortcut] group, exactly
    Li et al.'s accuracy-sensitive case — recovers on fine-tune.
    Slims strictly more than the protect rule at the same fraction."""
    spec, params, samples, *_ = trained
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.5,
                                             tied="group")
    slim_spec, slim_params = repack(spec, params, keep)
    protect_spec, protect_params = repack(
        spec, params, uniform_filter_fraction_keep_sets(spec, params, 0.5))
    assert num_params(slim_params) < num_params(protect_params)

    pruned_map = _map50(slim_spec, slim_params, samples)
    slim_params, _, _ = _train(slim_spec, slim_params, samples, 300,
                               seed=3)
    m = _map50(slim_spec, slim_params, samples)
    print(f"tied-group 50%: pruned mAP@50 {pruned_map:.3f} -> "
          f"fine-tuned {m:.3f}")
    assert m >= 0.7, f"v3 tied-group slimmed+finetuned mAP@50 {m:.3f}"
