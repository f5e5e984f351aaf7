"""The headline accuracy-contract shape (BASELINE.json:5,9,10) on the
learnable fixture: train to high mAP, then the iterative filter-prune loop
0.25 -> 0.5 -> 0.75 with PHYSICAL repack each round, measuring mAP@50
right after each prune (drop) and after each round's fine-tune
(recovery). The 0.75 row is the fixture-task stand-in for the
"<= 2.0 mAP@50 drop at 75% filter pruning" contract until real VOC
exists (SURVEY.md §7.5). Deterministic on the CPU backend; results
recorded in docs/PERF.md.

``--family {v2,v3,v4}`` selects the detector family's fixture
(VERDICT r4 Missing #3: the iterative evidence must exist at every
family's deployment config, not just v2's):

* ``v2`` — the region-head chain graph (tiny_region_cfg).
* ``v3`` — the [yolo] shortcut/FPN graph (tiny_yolo3_cfg); pair with
  ``--tied group`` for the identity-path-slimming recipe.
* ``v4`` — the CSP grouped-route graph (tiny_yolo4_cfg) trained with
  its CANONICAL iou_loss=ciou keys; the CSP source convs prune with
  split-BALANCED keep-sets (the uniform-path default).

``--criterion {l1,bn_gamma,fpgm,taylor}`` selects the filter-ranking
criterion so the structured criteria can be compared head-to-head on
the identical schedule/seeds (taylor scores on 4 training batches per
round, compress/taylor.py)."""
import argparse
import itertools
import sys
import tempfile

sys.path.insert(0, ".")
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp  # noqa: E402

from modelcompression_tpu.compress import (  # noqa: E402
    repack, taylor_filter_keep_sets, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.data.fixtures import (  # noqa: E402
    FIXTURE_CLASSES, make_fake_voc, tiny_region_cfg, tiny_yolo3_cfg,
    tiny_yolo4_cfg,
)
from modelcompression_tpu.data.voc import (  # noqa: E402
    load_list_dataset, read_data_cfg,
)
from modelcompression_tpu.evaluation import EvalConfig, evaluate  # noqa
from modelcompression_tpu.models import (  # noqa: E402
    init_params, num_params, parse_cfg,
)
from modelcompression_tpu.train import (  # noqa: E402
    BatchLoader, TrainConfig, TrainState, make_optimizer, make_train_step,
)

EVAL = EvalConfig(batch_size=8, conf_thresh=0.005, max_detections=20)
FRACTIONS = (0.25, 0.5, 0.75)
BASE_STEPS = 600
ROUND_STEPS = 400

FAMILY_CFGS = {
    "v2": lambda mul: tiny_region_cfg(num_classes=3, width=96, height=96),
    "v3": lambda mul: tiny_yolo3_cfg(num_classes=3, width=96, height=96),
    "v4": lambda mul: tiny_yolo4_cfg(num_classes=3, width=96, height=96,
                                     iou_loss="ciou", chmul=mul),
}


def train_steps(spec, params, samples, n, seed):
    config = TrainConfig.from_spec(spec, augment_flip=False,
                                   augment_jitter=0.0, max_boxes=8)
    loader = BatchLoader(samples, batch_size=8, net_h=96, net_w=96,
                         max_boxes=8, seed=seed)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(seed))
    step = make_train_step(spec, config, tx)
    it = iter(loader)
    for _ in range(n):
        imgs, tgts = next(it)
        state, m = step(state, jnp.asarray(imgs), jnp.asarray(tgts))
    return state["params"], float(m["loss"])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--criterion", default="l1",
                    choices=("l1", "bn_gamma", "fpgm", "taylor"))
    ap.add_argument("--family", default="v2", choices=sorted(FAMILY_CFGS))
    ap.add_argument("--tied", default="protect",
                    choices=("protect", "group"),
                    help="shortcut-tied conv policy (v3 graphs): "
                         "'group' slims the identity paths with shared "
                         "keep-sets")
    ap.add_argument("--base-steps", type=int, default=BASE_STEPS)
    ap.add_argument("--round-steps", type=int, default=ROUND_STEPS)
    ap.add_argument("--chmul", type=int, default=1,
                    help="v4 fixture channel multiplier: widens the net "
                         "so the 75%%-pruned REMNANT has capacity "
                         "comparable to the v2 fixture's (~10k params); "
                         "chmul=2 leaves ~16k at 75%%")
    args = ap.parse_args()
    root = tempfile.mkdtemp(prefix="l1sweep")
    data_cfg = make_fake_voc(root, n_images=16, image_size=96, seed=0)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    spec = parse_cfg(FAMILY_CFGS[args.family](args.chmul))
    params = init_params(spec, jax.random.key(0))
    params, loss = train_steps(spec, params, samples, args.base_steps,
                               seed=1)
    base = evaluate(params, spec, samples, FIXTURE_CLASSES, EVAL).map50
    print(f"family: {args.family}  criterion: {args.criterion}"
          + (f"  tied: {args.tied}" if args.tied != "protect" else ""))
    print(f"baseline: {args.base_steps} steps, loss {loss:.2f}, "
          f"mAP@50 {base*100:.1f}, params {num_params(params)/1e3:.0f}k")

    prev_frac = 0.0
    for ridx, frac in enumerate(FRACTIONS):
        inc = 1.0 - (1.0 - frac) / (1.0 - prev_frac)
        if args.criterion == "taylor":
            score_loader = BatchLoader(samples, batch_size=8, net_h=96,
                                       net_w=96, max_boxes=8,
                                       seed=100 + ridx)
            keep = taylor_filter_keep_sets(
                params, spec, itertools.islice(iter(score_loader), 4), inc,
                seen=20000, tied=args.tied)
        else:
            keep = uniform_filter_fraction_keep_sets(
                spec, params, inc, criterion=args.criterion,
                tied=args.tied)
        spec, params = repack(spec, params, keep)
        pruned = evaluate(params, spec, samples, FIXTURE_CLASSES,
                          EVAL).map50
        params, loss = train_steps(spec, params, samples,
                                   args.round_steps, seed=2 + ridx)
        rec = evaluate(params, spec, samples, FIXTURE_CLASSES, EVAL).map50
        print(f"round {ridx}: cum {frac:.0%} filters pruned + repacked "
              f"(params {num_params(params)/1e3:.0f}k) | "
              f"mAP {pruned*100:5.1f} pruned -> {rec*100:5.1f} after "
              f"{args.round_steps}-step fine-tune (delta vs base "
              f"{(rec-base)*100:+.1f})")
        prev_frac = frac


if __name__ == "__main__":
    main()
