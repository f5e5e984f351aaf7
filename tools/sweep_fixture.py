"""Config-2 sweep shape (BASELINE.json:8) on the learnable fixture: train
to high mAP, then unstructured prune at 50/75/90% and measure mAP@50
before and after a short masked fine-tune at each sparsity.
``--criterion magnitude`` (per-layer, the default) | ``global`` | ``lamp``.
Deterministic on the CPU backend; results recorded in docs/PERF.md."""
import argparse
import sys
import tempfile

sys.path.insert(0, ".")
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp  # noqa: E402

from modelcompression_tpu.compress import (  # noqa: E402
    apply_masks, lamp_masks, magnitude_masks_global,
    magnitude_masks_perlayer, mask_sparsity,
)

MASK_FNS = {"magnitude": magnitude_masks_perlayer,
            "global": magnitude_masks_global,
            "lamp": lamp_masks}
args = argparse.ArgumentParser(description=__doc__)
args.add_argument("--criterion", default="magnitude",
                  choices=tuple(MASK_FNS))
args = args.parse_args()
from modelcompression_tpu.data.fixtures import (  # noqa: E402
    FIXTURE_CLASSES, make_fake_voc, tiny_region_cfg,
)
from modelcompression_tpu.data.voc import (  # noqa: E402
    load_list_dataset, read_data_cfg,
)
from modelcompression_tpu.evaluation import EvalConfig, evaluate  # noqa
from modelcompression_tpu.models import init_params, parse_cfg  # noqa
from modelcompression_tpu.train import (  # noqa: E402
    BatchLoader, TrainConfig, TrainState, make_optimizer, make_train_step,
)

EVAL = EvalConfig(batch_size=8, conf_thresh=0.005, max_detections=20)


def train_steps(spec, params, samples, n, seed, masks=None):
    config = TrainConfig.from_spec(spec, augment_flip=False,
                                   augment_jitter=0.0, max_boxes=8)
    loader = BatchLoader(samples, batch_size=8, net_h=96, net_w=96,
                         max_boxes=8, seed=seed)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(seed),
                              weight_masks=masks or {})
    step = make_train_step(spec, config, tx)
    it = iter(loader)
    for _ in range(n):
        imgs, tgts = next(it)
        state, m = step(state, jnp.asarray(imgs), jnp.asarray(tgts))
    return state["params"]


with tempfile.TemporaryDirectory() as td:
    data_cfg = make_fake_voc(td, n_images=16, image_size=96, seed=0)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=96, height=96))
    params = train_steps(spec, init_params(spec, jax.random.key(0)),
                         samples, 600, seed=1)
    base = evaluate(params, spec, samples, FIXTURE_CLASSES, EVAL).map50
    print(f"criterion: {args.criterion}")
    print(f"baseline mAP@50: {base*100:.1f}")
    for s in (0.5, 0.75, 0.9):
        masks = MASK_FNS[args.criterion](params, spec, s)
        ach = float(mask_sparsity(masks))
        pruned = apply_masks(params, masks)
        m0 = evaluate(pruned, spec, samples, FIXTURE_CLASSES, EVAL).map50
        tuned = train_steps(spec, pruned, samples, 200, seed=int(s * 100),
                            masks=masks)
        m1 = evaluate(tuned, spec, samples, FIXTURE_CLASSES, EVAL).map50
        print(f"sparsity {s:.0%} (achieved {ach:.1%}): "
              f"pruned {m0*100:.1f} -> finetuned {m1*100:.1f} "
              f"(delta vs base {100*(m1-base):+.1f})")
