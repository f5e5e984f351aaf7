"""Accuracy evidence (SURVEY.md §7.5, VERDICT r1 #6): with no real VOC or
pretrained weights in the environment, the available substitute for the
<=2-mAP-drop contract (BASELINE.json:5) is demonstrating the training stack
*learns* — overfit the learnable fixture task (colored boxes, class ==
color) to high mAP@50 on its train set.

Deterministic: fixed dataset seed, loader seed, PRNG keys, CPU backend
(conftest). Observed trajectory at head: loss 1.43 @ step100 -> 0.20
@ step600, mAP@50 = 0.909.
"""

import jax
import jax.numpy as jnp

from modelcompression_tpu.data.fixtures import (
    FIXTURE_CLASSES, make_fake_voc, tiny_region_cfg,
)
from modelcompression_tpu.data.voc import load_list_dataset, read_data_cfg
from modelcompression_tpu.evaluation import EvalConfig, evaluate
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.train import (
    BatchLoader, TrainConfig, TrainState, make_optimizer, make_train_step,
)


def test_fixture_task_learns_to_high_map(tmp_path):
    data_cfg = make_fake_voc(str(tmp_path), n_images=16, image_size=96,
                             seed=0)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=96, height=96))
    params = init_params(spec, jax.random.key(0))
    config = TrainConfig.from_spec(spec, augment_flip=False, max_boxes=8)
    loader = BatchLoader(samples, batch_size=8, net_h=96, net_w=96,
                         max_boxes=8, seed=1)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(1))
    step = make_train_step(spec, config, tx)

    it = iter(loader)
    first_loss = None
    for i in range(600):
        imgs, tgts = next(it)
        state, m = step(state, jnp.asarray(imgs), jnp.asarray(tgts))
        if i == 0:
            first_loss = float(m["loss"])
    last_loss = float(m["loss"])
    assert last_loss < first_loss / 5, (first_loss, last_loss)

    res = evaluate(state["params"], spec, samples, FIXTURE_CLASSES,
                   EvalConfig(batch_size=8, conf_thresh=0.005,
                              max_detections=20))
    assert res.map50 >= 0.8, res.summary()
