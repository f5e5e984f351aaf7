"""Fine-tune CLI — post-prune fine-tuning (the reference's fine-tune
script; BASELINE.json:5,9). With ``--preserve-sparsity`` the zero pattern of
the loaded (pruned) weights becomes the fine-tune mask, so pruned weights
stay exactly zero through training — the masked fine-tune path whose mask
application runs on device (no host round-trips).

Also drives the iterative prune->fine-tune->eval loop
(``--iterate 0.25,0.5,0.75``), the reference's Tiny-YOLOv2 config
(BASELINE.json:10).

Example:
  finetune --cfg slim.cfg --weights slim.weights --data voc.data \
           --steps 1000 --preserve-sparsity
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.cli.common import (
    add_data_args, add_model_args, add_parallel_args, build_mesh,
    enable_compilation_cache, load_dataset, load_model, load_train_dataset,
    resolve_batch_subdivisions, resolve_mask_backend,
)
from modelcompression_tpu.compress import DEFAULT_MASK_BACKEND, MASK_BACKENDS
from modelcompression_tpu.evaluation import EvalConfig, evaluate
from modelcompression_tpu.models import save_weights
from modelcompression_tpu.models.cfg import ConvLayer
from modelcompression_tpu.train import (
    BatchLoader, TrainConfig, TrainState, iterative_prune_finetune,
    make_optimizer, train,
)
from modelcompression_tpu.utils.logging import MetricsLogger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="finetune", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    add_model_args(p)
    add_data_args(p)
    p.add_argument("--steps", type=int, required=True,
                   help="fine-tune steps (per round when iterating)")
    p.add_argument("--batch", type=int, default=None,
                   help="EFFECTIVE batch per weight update "
                        "(default: cfg batch=)")
    p.add_argument("--subdivisions", type=int, default=None,
                   help="micro-batches accumulated per update (default: "
                        "cfg subdivisions=; 1 = whole batch in one "
                        "forward, fastest on TPU when memory allows)")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--max-boxes", type=int, default=30)
    p.add_argument("--mosaic", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="4-image mosaic augmentation. Default: the "
                        "cfg's [net] mosaic= flag")
    p.add_argument("--hsv", action="store_true",
                   help="Darknet HSV distortion (knobs from the cfg's "
                        "[net] hue/saturation/exposure)")
    p.add_argument("--jitter", type=float, default=None,
                   help="Darknet crop-jitter fraction in [0, 0.5); "
                        "default: the cfg's [region] jitter value; "
                        "pass 0 to disable")
    p.add_argument("--freeze", type=int, default=0, metavar="N",
                   help="freeze the first N conv layers (Darknet .conv.N "
                        "counting): inference BN on running stats, no "
                        "gradient or weight/stat updates — pairs with "
                        "--partial darknet19.conv.N for head-only "
                        "transfer learning, and skips the frozen prefix's "
                        "backward entirely (docs/PERF.md)")
    p.add_argument("--ema", type=float, default=None, metavar="DECAY",
                   help="maintain an exponential moving average of the "
                        "weights (ema = d*ema + (1-d)*w after every "
                        "update, inside the jitted step) and SAVE/EVAL "
                        "the EMA model — the modern-YOLO convention for "
                        "smoother fine-tune endpoints. Typical decay "
                        "0.999-0.9999. Single-pass mode only (not "
                        "--iterate)")
    p.add_argument("--bn-l1", type=float, default=0.0,
                   help="network-slimming sparsity training (Liu et al. "
                        "2017): add this L1 penalty on all BN gammas to "
                        "polarize channel importances before a "
                        "--mode/--iterate-mode bn_gamma prune; 0 = off")
    p.add_argument("--preserve-sparsity", action="store_true",
                   help="freeze the zero pattern of the loaded weights")
    p.add_argument("--gmp", type=float, default=None, metavar="SPARSITY",
                   help="gradual magnitude pruning (Zhu & Gupta 2017): "
                        "ramp weight sparsity to this final value on a "
                        "cubic schedule, recomputing the masks ON DEVICE "
                        "inside the train step (compress/gmp.py) — "
                        "sparsify-while-training instead of "
                        "prune-then-fine-tune")
    p.add_argument("--gmp-begin", type=int, default=0,
                   help="first step of the GMP ramp (default 0)")
    p.add_argument("--gmp-end", type=int, default=None,
                   help="step at which the ramp reaches the final "
                        "sparsity (default: the run's LAST step, "
                        "--steps - 1 — steps are 0-based; values past "
                        "the last step are rejected, they would silently "
                        "finish below the target)")
    p.add_argument("--gmp-freq", type=int, default=100,
                   help="recompute the masks every this many steps "
                        "(plus once exactly at --gmp-end)")
    p.add_argument("--gmp-initial", type=float, default=0.0,
                   help="sparsity at the start of the ramp (default 0)")
    p.add_argument("--gmp-global", action="store_true",
                   help="one magnitude threshold across all convs instead "
                        "of per-layer sparsity")
    p.add_argument("--distill", default=None, metavar="WEIGHTS",
                   help="knowledge-distillation fine-tune: train against "
                        "this TEACHER model's outputs in addition to the "
                        "ground truth (train/distill.py; [region] and "
                        "multi-head [yolo] families both supported) — "
                        "typically the original unpruned .weights; with "
                        "--iterate every round's slimmed student distills "
                        "from it")
    p.add_argument("--distill-cfg", default=None,
                   help="teacher architecture cfg (default: --cfg; must "
                        "share the student's anchors/classes head)")
    p.add_argument("--distill-weight", type=float, default=1.0,
                   help="blend of the distillation loss into the total "
                        "(total = detection + W * distill)")
    p.add_argument("--distill-temp", type=float, default=1.0,
                   help="softmax temperature for the class soft targets "
                        "([region] family; [yolo] classes are multi-label "
                        "sigmoids, distilled by MSE)")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware fine-tune: train with the "
                        "deployed int8 grids simulated in the forward "
                        "(straight-through fake-quant; compress/qat.py), "
                        "then report the exported int8 model's mAP next "
                        "to the f32 one")
    p.add_argument("--qat-layers", default="all",
                   help="which convs train+deploy int8 under --qat: "
                        "'all', 'auto[:K]' (min(Cin,Cout) >= K, default "
                        "128 — the measured MXU crossover), or explicit "
                        "comma-separated layer indices")
    p.add_argument("--qat-calib-images", type=int, default=8,
                   help="images used to calibrate the static activation "
                        "grids before QAT training")
    p.add_argument("--qat-quantile", type=float, default=None,
                   help="calibrate activation grids at this quantile of "
                        "|activation| instead of the max")
    p.add_argument("--save-qmodel", default=None, metavar="PATH",
                   help="with --qat: also export the trained int8 "
                        "deployment artifact (the exact grids training "
                        "rehearsed; serve with eval/detect --qmodel)")
    p.add_argument("--pack", nargs="?", const="huffman", default=None,
                   choices=("huffman", "fixed"), metavar="METHOD",
                   help="with --save-qmodel: entropy-code the int8 "
                        "weight tensors (compress/packing.py; loading "
                        "is transparent)")
    p.add_argument("--iterate", default=None,
                   help="comma list of cumulative prune fractions for the "
                        "iterative loop, e.g. 0.25,0.5,0.75")
    p.add_argument("--iterate-mode", default="l1_filter",
                   choices=("l1_filter", "bn_gamma", "fpgm", "taylor",
                            "magnitude", "global", "lamp"))
    p.add_argument("--tied", default="protect",
                   choices=("protect", "group"),
                   help="residual-graph policy for the structured "
                        "--iterate modes (same knob as prune --tied): "
                        "'protect' (default) keeps shortcut-tied convs; "
                        "'group' prunes each tied group with ONE shared "
                        "keep-set ranked by group-summed scores — slims "
                        "the residual identity paths, paired with each "
                        "round's fine-tune recovery (the Li et al. §4.2 "
                        "sensitive-layer case the one-shot prune CLI "
                        "cannot recover)")
    p.add_argument("--taylor-batches", type=int, default=8,
                   help="--iterate-mode taylor: training batches per round "
                        "the gate-gradient filter scores average over "
                        "(compress/taylor.py)")
    p.add_argument("--mask-backend", default=DEFAULT_MASK_BACKEND,
                   choices=MASK_BACKENDS,
                   help="magnitude/global mask implementation for "
                        "--iterate (fused one-program XLA default | "
                        "pallas Mosaic twins | reference argsort oracle)")
    p.add_argument("--use-pallas", action="store_true",
                   help="alias for --mask-backend pallas")
    p.add_argument("--ckpt-dir", default=None,
                   help="save a checkpoint after every iterative round")
    p.add_argument("--resume", action="store_true",
                   help="resume the iterative loop from the latest round "
                        "checkpoint in --ckpt-dir")
    p.add_argument("--out", required=True, help="output .weights path")
    p.add_argument("--out-cfg", default=None,
                   help="output .cfg (written when iterating with repack)")
    p.add_argument("--log-jsonl", default=None)
    p.add_argument("--seed", type=int, default=0)
    add_parallel_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    args.mask_backend = resolve_mask_backend(args)
    enable_compilation_cache()
    spec, params, seen = load_model(args)
    samples, names = load_train_dataset(args)
    if not samples:
        print("error: dataset is empty", file=sys.stderr)
        return 2
    eval_samples, eval_names = load_dataset(args)
    if not eval_samples:
        print("error: eval dataset is empty (check the .data valid= list "
              "or the devkit image set) — refusing to train for nothing",
              file=sys.stderr)
        return 2
    if args.tied == "group" and (
            not args.iterate
            or args.iterate_mode not in ("l1_filter", "bn_gamma", "fpgm",
                                         "taylor")):
        print("error: --tied group requires --iterate with a structured "
              "mode (l1_filter | bn_gamma | fpgm | taylor); the masked "
              "modes have no keep-sets to tie", file=sys.stderr)
        return 2
    if args.preserve_sparsity and args.iterate:
        print("error: --preserve-sparsity cannot be combined with "
              "--iterate (the iterative loop re-derives its own masks/"
              "keep-sets each round)", file=sys.stderr)
        return 2
    if args.gmp is not None and (args.preserve_sparsity or args.iterate):
        print("error: --gmp is a standalone sparsification schedule — it "
              "recomputes its own masks, so it cannot be combined with "
              "--preserve-sparsity or --iterate", file=sys.stderr)
        return 2
    if args.gmp is not None and args.qat:
        print("error: --gmp cannot be combined with --qat (the activation "
              "grids are calibrated on the dense model and would go stale "
              "as the sparsity ramps; run GMP first, then QAT the sparse "
              "model)", file=sys.stderr)
        return 2
    if args.qat and args.iterate:
        print("error: --qat cannot be combined with --iterate (each "
              "repack round changes the architecture, so the calibrated "
              "activation grids would go stale; run the iterative prune "
              "loop first, then QAT the slimmed model)", file=sys.stderr)
        return 2
    if args.save_qmodel and not args.qat:
        print("error: --save-qmodel requires --qat (it exports the "
              "trained int8 deployment; for PTQ use eval --int8 "
              "--save-qmodel)", file=sys.stderr)
        return 2
    if args.pack and not args.save_qmodel:
        print("error: --pack entropy-codes a saved artifact; it "
              "requires --save-qmodel", file=sys.stderr)
        return 2
    n_convs = sum(1 for l in spec.layers if isinstance(l, ConvLayer))
    if not 0 <= args.freeze < n_convs:
        print(f"error: --freeze {args.freeze} must leave at least one "
              f"trainable conv (network has {n_convs})", file=sys.stderr)
        return 2
    if args.ema is not None:
        if not 0.0 < args.ema < 1.0:
            print(f"error: --ema decay must be in (0, 1), got {args.ema}",
                  file=sys.stderr)
            return 2
        if args.iterate:
            print("error: --ema is single-pass only: the iterative loop "
                  "repacks the architecture each round, which would "
                  "orphan the EMA buffers", file=sys.stderr)
            return 2

    overrides = {}
    if args.ema is not None:
        overrides["ema_decay"] = args.ema
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.jitter is not None:
        if not 0.0 <= args.jitter < 0.5:
            print(f"error: --jitter must be in [0, 0.5), got {args.jitter}",
                  file=sys.stderr)
            return 2
        overrides["augment_jitter"] = args.jitter
    # full augmentation surface for the accuracy-recovery path
    # (BASELINE.json:9 "short fine-tune on VOC"): cfg jitter is on by
    # default via from_spec; mosaic/HSV are the same opt-ins train has
    try:
        batch, subdiv = resolve_batch_subdivisions(args, spec)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    qat_spec = None
    if args.qat:
        from modelcompression_tpu.compress import qat_spec_from_batches
        from modelcompression_tpu.cli.common import prep_calibration
        try:
            int8_sel, chunks, n = prep_calibration(
                spec, samples, args.qat_calib_images, args.qat_layers,
                what="qat")
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        n_sel = "all" if int8_sel is None else str(len(int8_sel))
        print(f"qat: calibrating activation grids on {n} images "
              f"({n_sel} convs int8)...", file=sys.stderr)
        qat_spec = qat_spec_from_batches(params, spec, chunks,
                                         int8_layers=int8_sel,
                                         quantile=args.qat_quantile)
    distill_plan = None
    if args.distill:
        from modelcompression_tpu.models import load_cfg, load_weights
        from modelcompression_tpu.train import make_distill_plan
        t_spec = load_cfg(args.distill_cfg) if args.distill_cfg else spec
        t_params, _ = load_weights(args.distill, t_spec)
        try:
            distill_plan = make_distill_plan(
                t_params, t_spec, spec, weight=args.distill_weight,
                temp=args.distill_temp)
        except ValueError as e:
            print(f"error: --distill: {e}", file=sys.stderr)
            return 2
        print(f"distilling from teacher {args.distill} "
              f"(weight {args.distill_weight:g}, T {args.distill_temp:g})",
              file=sys.stderr)
    gmp_spec = None
    if args.gmp is not None:
        from modelcompression_tpu.compress import GMPSpec
        # the step counter the in-program schedule sees is 0-based, so
        # the last tick of an N-step run is step N-1: an end past that
        # (or a begin at/after it) would silently finish below the final
        # sparsity — reject instead (the review's "no silent caps" rule)
        last = args.steps - 1
        if args.gmp_end is not None and args.gmp_end > last:
            print(f"error: --gmp-end {args.gmp_end} is past the run's "
                  f"last step {last} (steps are 0-based); the ramp would "
                  f"never reach the final sparsity", file=sys.stderr)
            return 2
        if args.gmp_begin >= last:
            print(f"error: --gmp-begin {args.gmp_begin} leaves no room "
                  f"for the ramp (last step is {last})", file=sys.stderr)
            return 2
        try:
            gmp_spec = GMPSpec(
                final_sparsity=args.gmp,
                initial_sparsity=args.gmp_initial,
                begin=args.gmp_begin,
                end=args.gmp_end if args.gmp_end is not None else last,
                frequency=args.gmp_freq,
                per_layer=not args.gmp_global)
        except ValueError as e:
            print(f"error: --gmp: {e}", file=sys.stderr)
            return 2
    mosaic = (args.mosaic if args.mosaic is not None
              else spec.net.mosaic)
    config = TrainConfig.from_spec(spec, max_boxes=args.max_boxes,
                                   augment_mosaic=mosaic,
                                   augment_hsv=args.hsv,
                                   subdivisions=subdiv, qat=qat_spec,
                                   bn_l1=args.bn_l1, gmp=gmp_spec,
                                   freeze_prefix=args.freeze,
                                   **overrides)
    loader = BatchLoader(samples, batch_size=batch,
                         net_h=spec.net.height, net_w=spec.net.width,
                         max_boxes=args.max_boxes, seed=args.seed)
    logger = MetricsLogger(jsonl_path=args.log_jsonl)
    mesh, tp = build_mesh(args)
    if mesh is not None and (batch // subdiv) % mesh.shape["data"]:
        print(f"error: micro-batch {batch // subdiv} (batch/subdivisions) "
              f"must be divisible by --dp {mesh.shape['data']}",
              file=sys.stderr)
        return 2

    if args.iterate:
        fractions = [float(x) for x in args.iterate.split(",") if x]

        def eval_fn(s, p):
            res = evaluate(p, s, eval_samples, eval_names,
                           EvalConfig(batch_size=batch))
            print(res.summary())
            return {"map50": res.map50}

        rounds = iterative_prune_finetune(
            spec, params, config, loader, fractions=fractions,
            steps_per_round=args.steps, eval_fn=eval_fn,
            mode=args.iterate_mode, rng=jax.random.key(args.seed),
            logger=logger, ckpt_dir=args.ckpt_dir, resume=args.resume,
            initial_seen=seen, mesh=mesh, tp=tp,
            mask_backend=args.mask_backend, distill=distill_plan,
            taylor_batches=args.taylor_batches, tied=args.tied)
        if not rounds:
            print("nothing to do: all rounds already checkpointed")
            return 0
        final = rounds[-1]
        save_weights(args.out, final.spec,
                     jax.tree.map(np.asarray, final.params),
                     seen=final.seen)
        print(f"wrote {args.out}")
        if args.iterate_mode in ("l1_filter", "bn_gamma", "fpgm", "taylor"):
            from modelcompression_tpu.models import dump_cfg
            out_cfg = args.out_cfg or os.path.splitext(args.out)[0] + ".cfg"
            with open(out_cfg, "w") as f:
                f.write(dump_cfg(final.spec))
            print(f"wrote {out_cfg}")
        return 0

    weight_masks = {}
    if gmp_spec is not None:
        from modelcompression_tpu.compress import gmp_init_masks
        weight_masks = gmp_init_masks(params, spec, gmp_spec)
        mode = "global" if args.gmp_global else "per-layer"
        print(f"gmp: ramping {mode} sparsity "
              f"{gmp_spec.initial_sparsity:.0%} -> "
              f"{gmp_spec.final_sparsity:.0%} over steps "
              f"[{gmp_spec.begin}, {gmp_spec.end}], mask recompute every "
              f"{gmp_spec.frequency} steps (on device)")
    if args.preserve_sparsity:
        for i, p in params.items():
            m = jnp.asarray(np.asarray(p["w"]) != 0)
            if float(m.mean()) < 1.0:
                weight_masks[i] = m
        kept = {k: float(np.asarray(m).mean())
                for k, m in weight_masks.items()}
        if kept:
            print(f"preserving sparsity in {len(kept)} layers "
                  f"(avg keep {np.mean(list(kept.values())):.2%})")
        else:
            print("warning: --preserve-sparsity set but weights are dense",
                  file=sys.stderr)

    tx = make_optimizer(config)
    # carry the header's images-seen counter: it gates the region loss's
    # early-training prior term, which must not re-trigger on a converged
    # model; the UPDATED count is written back to the output header
    state = TrainState.create(params, tx, jax.random.key(args.seed),
                              weight_masks=weight_masks, seen=seen,
                              ema=args.ema is not None)
    state = train(state, spec, config, loader, n_steps=args.steps,
                  logger=logger, mesh=mesh, tp=tp, distill=distill_plan)
    # with --ema the DELIVERED model is the EMA shadow (weights + BN
    # running stats); the live SGD iterate stays in the state only
    out_params = state["ema_params"] if args.ema is not None \
        else state["params"]
    save_weights(args.out, spec,
                 jax.tree.map(np.asarray, out_params),
                 seen=int(state["seen"]))
    print(f"wrote {args.out}"
          + (f" (EMA weights, decay {args.ema:g})"
             if args.ema is not None else ""))
    if gmp_spec is not None:
        masks = state["weight_masks"]
        n_total = sum(int(np.asarray(m).size) for m in masks.values())
        n_zero = sum(int((~np.asarray(m)).sum()) for m in masks.values())
        print(f"gmp: final sparsity {n_zero / max(n_total, 1):.2%} "
              f"({n_zero}/{n_total} weights zeroed; zero pattern is baked "
              f"into {args.out} — fine-tune further with "
              f"--preserve-sparsity)")
    res = evaluate(out_params, spec, eval_samples, eval_names,
                   EvalConfig(batch_size=batch))
    print(res.summary())
    if qat_spec is not None:
        # the number QAT exists for: the DEPLOYED int8 model's accuracy
        # (same grids training rehearsed; eval --int8 reproduces it from
        # the saved .weights by recalibrating)
        from modelcompression_tpu.compress import (
            forward_quantized, quantize_qat,
        )
        qparams = quantize_qat(out_params, spec, qat_spec)
        qres = evaluate(qparams, spec, eval_samples, eval_names,
                        EvalConfig(batch_size=batch,
                                   forward_fn=forward_quantized))
        print("int8 deployment (QAT grids):")
        print(qres.summary())
        if args.save_qmodel:
            from modelcompression_tpu.compress import save_qmodel
            save_qmodel(args.save_qmodel, qparams, spec, pack=args.pack)
            print(f"wrote int8 deployment artifact to {args.save_qmodel} "
                  f"(serve with eval/detect --qmodel)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
