"""Prune CLI — mirrors the reference's prune script (BASELINE.json:5,8,9).

Modes:
  magnitude   per-layer unstructured magnitude masks at --sparsity
  global      one global |w| threshold at --sparsity
  lamp        layer-adaptive global magnitude (Lee et al. 2021): global
              rank over w^2 / per-layer surviving-mass suffix sums — the
              per-layer sparsity allocation becomes automatic; --sparsity
  l1_filter   L1-norm filter ranking at --fraction + physical channel
              repack; writes a rewritten cfg alongside the slimmed weights.
              All filter modes also take --target-flops F instead of a
              fraction: automatic per-layer allocation to a conv-FLOP
              budget (global layer-normalized rank, compress/flops.py)
  bn_gamma    network slimming (learned BN |gamma| filter ranking) —
              same repack machinery as l1_filter
  fpgm        geometric-median filter ranking (He et al. 2019): prune the
              filters nearest their layer's geometric median (smallest
              distance sums) — data-free like l1; same repack machinery
  taylor      first-order Taylor filter ranking (Molchanov et al. 2017):
              |sum a * dL/da| measured on --score-batches training batches
              from --data (required); same repack machinery as l1_filter
  lowrank     SVD-factor each conv into kxk->r linear + 1x1 (r chosen by
              --energy or --rank); writes a rewritten cfg whose factored
              layers are PLAIN convs (every surface consumes them)

Examples:
  prune --cfg yolov2-voc.cfg --weights yolov2.weights \
        --mode magnitude --sparsity 0.75 --out pruned.weights
  prune --cfg yolov2-voc.cfg --weights yolov2.weights \
        --mode l1_filter --fraction 0.75 --out slim.weights \
        --out-cfg slim.cfg
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from modelcompression_tpu.cli.common import (
    add_model_args, enable_compilation_cache, load_model,
    resolve_mask_backend,
)
from modelcompression_tpu.compress import (
    DEFAULT_MASK_BACKEND, MASK_BACKENDS, apply_masks, magnitude_mask_fn,
    mask_sparsity, repack, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.models import dump_cfg, num_params, save_weights


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="prune", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    add_model_args(p)
    p.add_argument("--mode", default="magnitude",
                   choices=("magnitude", "global", "lamp", "l1_filter",
                            "bn_gamma", "fpgm", "taylor", "lowrank"))
    p.add_argument("--sparsity", type=float, default=None,
                   help="target weight sparsity (magnitude/global/lamp "
                        "modes)")
    p.add_argument("--fraction", type=float, default=None,
                   help="filter drop fraction (l1_filter/bn_gamma/fpgm/"
                        "taylor modes)")
    p.add_argument("--score-batches", type=int, default=8,
                   help="taylor mode: number of training batches (of "
                        "--batch images from --data) the gate-gradient "
                        "scores are averaged over")
    p.add_argument("--score-seed", type=int, default=0,
                   help="taylor mode: shuffle seed for the scoring batches")
    p.add_argument("--taylor-sq", action="store_true",
                   help="taylor mode: squared gate-gradient importance "
                        "(Molchanov et al. 2019) instead of the 2017 "
                        "|sum a*dL/da| — less noisy when per-batch "
                        "gradients change sign")
    p.add_argument("--tied", default="protect",
                   choices=("protect", "group"),
                   help="residual ([shortcut]) graph policy for filter "
                        "modes: 'protect' (default) keeps shortcut-tied "
                        "convs unpruned (Li et al. 2017 §4.2 conservative "
                        "option); 'group' prunes each tied group with ONE "
                        "shared keep-set ranked by group-summed scores — "
                        "slims the residual identity paths too (no effect "
                        "on chain graphs like YOLOv2)")
    p.add_argument("--fractions", default=None,
                   help="PER-LAYER drop fractions for l1_filter mode as "
                        "'convidx:frac,convidx:frac' (e.g. '0:0.25,2:0.5')"
                        "; unlisted prunable convs use --fraction (or 0). "
                        "The Li et al. sensitivity-scheduled workflow — "
                        "measure with tools/sensitivity_scan.py first")
    p.add_argument("--target-flops", type=float, default=None,
                   help="filter modes: AUTOMATIC per-layer allocation to a "
                        "conv-FLOP budget — drop globally-lowest "
                        "layer-normalized-score filters until the network "
                        "keeps this fraction of its conv FLOPs/img "
                        "(compress/flops.py; replaces --fraction/"
                        "--fractions with a deployment-speed target). "
                        "Prints the discovered per-layer schedule")
    p.add_argument("--min-filters", type=int, default=1,
                   help="--target-flops: floor of surviving filters per "
                        "prunable conv (default 1)")
    p.add_argument("--score-norm", default="l2",
                   choices=("l2", "mean", "none"),
                   help="--target-flops: cross-layer score normalization "
                        "for the global rank (default l2, Molchanov et "
                        "al. 2019 eq. 8)")
    p.add_argument("--energy", type=float, default=0.9,
                   help="lowrank mode: per-layer rank = smallest r whose "
                        "singular values keep this fraction of the "
                        "spectral energy (Eckart-Young truncation)")
    p.add_argument("--rank", default=None,
                   help="lowrank mode: surgical factoring — factor ONLY "
                        "the listed layers, as 'convidx:r,convidx:r' "
                        "(--energy is ignored; combine with --max-cost "
                        "to lift the FLOPs guard)")
    p.add_argument("--max-cost", type=float, default=1.0,
                   help="lowrank mode: factor a conv only when the "
                        "factored FLOPs are below this fraction of the "
                        "original (guard against rank-heavy layers)")
    p.add_argument("--out", required=True, help="output .weights path")
    p.add_argument("--out-cfg", default=None,
                   help="rewritten .cfg path (l1_filter mode)")
    p.add_argument("--mask-backend", default=DEFAULT_MASK_BACKEND,
                   choices=MASK_BACKENDS,
                   help="magnitude/global mask implementation: 'fused' "
                        "(default; one-program XLA segmented bisection — "
                        "the production path, no per-shape compiles), "
                        "'pallas' (hand-written Mosaic kernel twins), or "
                        "'reference' (per-shape stable-argsort CPU oracle)")
    p.add_argument("--use-pallas", action="store_true",
                   help="alias for --mask-backend pallas")
    p.add_argument("--sweep", default=None,
                   help="comma list of sparsities/fractions: prune at each "
                        "point, write <out stem>_<pct>.weights, and (with "
                        "--data) evaluate mAP@50 at each — the reference's "
                        "sparsity sweep driver (BASELINE.json:8)")
    p.add_argument("--data", default=None,
                   help="dataset (.data file or VOCdevkit root) for sweep "
                        "evaluation")
    p.add_argument("--image-set", default="test")
    p.add_argument("--batch", type=int, default=8)
    return p


# structured filter modes -> compress.criteria score criterion
_FILTER_MODE_CRITERION = {"l1_filter": "l1", "bn_gamma": "bn_gamma",
                          "fpgm": "fpgm"}


def _taylor_scores(args, spec, params, seen, with_groups=False,
                   full=False):
    """Gate-gradient Taylor scores from --score-batches training batches
    (compress/taylor.py). One XLA program, device-side accumulation.
    ``with_groups=True`` returns ``(untied_scores, group_scores)`` from
    the same pass (taylor_scores_with_groups — the --tied group rank
    input); ``full=True`` returns ``(untied, group, csp)`` — the budget
    allocator's full input (taylor_scores_all)."""
    import itertools

    from modelcompression_tpu.cli.common import load_train_dataset
    from modelcompression_tpu.compress import (
        taylor_filter_scores_device, taylor_scores_all,
        taylor_scores_with_groups,
    )
    from modelcompression_tpu.train.loader import BatchLoader

    samples, _ = load_train_dataset(args)
    loader = BatchLoader(samples, args.batch, spec.net.height,
                         spec.net.width, seed=args.score_seed,
                         drop_last=False)
    batches = itertools.islice(iter(loader), args.score_batches)
    if full:
        return taylor_scores_all(params, spec, batches, seen=seen,
                                 second_moment=args.taylor_sq)
    if with_groups:
        return taylor_scores_with_groups(params, spec, batches, seen=seen,
                                         second_moment=args.taylor_sq)
    return taylor_filter_scores_device(params, spec, batches, seen=seen,
                                       second_moment=args.taylor_sq)


def _sweep(args, spec, params, seen) -> int:
    from modelcompression_tpu.cli.common import load_dataset
    from modelcompression_tpu.compress import keep_sets_from_scores
    from modelcompression_tpu.evaluation import EvalConfig, evaluate

    points = [float(x) for x in args.sweep.split(",") if x]
    for v in points:
        if not (0.0 <= v < 1.0):
            print(f"error: sweep point {v} out of [0, 1)", file=sys.stderr)
            return 2
    samples = names = None
    if args.data:
        samples, names = load_dataset(args)
    tay_scores = None
    if args.mode == "taylor":
        if not args.data:
            print("error: taylor mode needs --data (scores are measured "
                  "on training batches)", file=sys.stderr)
            return 2
        # scores are fraction-independent: measure once, rank per point
        tay_scores = _taylor_scores(args, spec, params, seen)
    import os
    stem = os.path.splitext(args.out)[0]
    rows = []
    for v in points:
        if args.mode in ("l1_filter", "bn_gamma", "fpgm", "taylor"):
            if args.mode == "taylor":
                keep = keep_sets_from_scores(tay_scores, v)
            else:
                crit = _FILTER_MODE_CRITERION[args.mode]
                keep = uniform_filter_fraction_keep_sets(spec, params, v,
                                                         criterion=crit,
                                                         tied=args.tied)
            out_spec, out_params = repack(spec, params, keep)
            achieved = 1.0 - num_params(out_params) / num_params(params)
        else:
            if args.mode == "lamp":
                from modelcompression_tpu.compress import lamp_masks
                masks = lamp_masks(params, spec, v)
            else:
                fn = magnitude_mask_fn(args.mode, args.mask_backend)
                masks = fn(params, spec, v)
            achieved = float(mask_sparsity(masks))
            out_spec, out_params = spec, apply_masks(params, masks)
        out_params = jax.tree.map(np.asarray, out_params)
        out = f"{stem}_{int(round(v * 100))}.weights"
        save_weights(out, out_spec, out_params, seen=seen)
        row = {"point": v, "achieved": achieved, "weights": out}
        if args.mode in ("l1_filter", "bn_gamma", "fpgm", "taylor"):
            out_cfg = f"{stem}_{int(round(v * 100))}.cfg"
            with open(out_cfg, "w") as f:
                f.write(dump_cfg(out_spec))
            row["cfg"] = out_cfg
        if samples is not None:
            res = evaluate(out_params, out_spec, samples, names,
                           EvalConfig(batch_size=args.batch))
            row["map50"] = res.map50
        rows.append(row)
        print(f"sweep {v:.0%}: achieved {achieved:.2%} -> {out}"
              + (f"  mAP@50 {row['map50'] * 100:.2f}"
                 if "map50" in row else ""))
    print(f"{'point':>6} {'achieved':>9} {'mAP@50':>8}")
    for r in rows:
        print(f"{r['point']:6.0%} {r['achieved']:9.2%} "
              + (f"{r['map50'] * 100:8.2f}" if "map50" in r else "      --"))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    args.mask_backend = resolve_mask_backend(args)
    enable_compilation_cache()
    spec, params, seen = load_model(args)
    n0 = num_params(params)

    if args.sweep:
        if args.mode == "lowrank":
            print("error: --sweep sweeps sparsities/fractions; lowrank "
                  "mode selects ranks by --energy/--rank (run per energy "
                  "point instead)", file=sys.stderr)
            return 2
        return _sweep(args, spec, params, seen)

    if args.mode in ("magnitude", "global", "lamp"):
        if args.sparsity is None:
            print(f"error: --sparsity is required for {args.mode} mode",
                  file=sys.stderr)
            return 2
        if not (0.0 <= args.sparsity < 1.0):
            print(f"error: --sparsity must be in [0, 1), got "
                  f"{args.sparsity}", file=sys.stderr)
            return 2
        if args.mode == "lamp":
            from modelcompression_tpu.compress import (
                lamp_layer_sparsities, lamp_masks,
            )
            masks = lamp_masks(params, spec, args.sparsity)
            per_layer = lamp_layer_sparsities(masks)
            print("lamp per-layer allocation: "
                  f"min {min(per_layer.values()):.2%}, "
                  f"max {max(per_layer.values()):.2%} "
                  f"over {len(per_layer)} convs")
        else:
            fn = magnitude_mask_fn(args.mode, args.mask_backend)
            masks = fn(params, spec, args.sparsity)
        achieved = float(mask_sparsity(masks))
        params = jax.tree.map(np.asarray, apply_masks(params, masks))
        save_weights(args.out, spec, params, seen=seen)
        print(f"{args.mode} prune: target sparsity {args.sparsity:.2%}, "
              f"achieved {achieved:.2%} over "
              f"{sum(m.size for m in masks.values())} weights")
        print(f"wrote {args.out}")
        if args.out_cfg:
            with open(args.out_cfg, "w") as f:
                f.write(dump_cfg(spec))
            print(f"wrote {args.out_cfg} (architecture unchanged)")
    elif args.mode == "lowrank":  # SVD factorization (compress/lowrank.py)
        from modelcompression_tpu.compress.lowrank import factor_network
        ranks = {}
        if args.rank:
            try:
                for tok in args.rank.split(","):
                    if not tok.strip():
                        continue
                    idx, _, val = tok.partition(":")
                    ranks[int(idx)] = int(val)
            except ValueError as e:
                print(f"error: bad --rank: {e}", file=sys.stderr)
                return 2
        if not (0.0 < args.energy <= 1.0):
            print(f"error: --energy must be in (0, 1], got {args.energy}",
                  file=sys.stderr)
            return 2
        try:
            fac_spec, fac_params, report = factor_network(
                jax.tree.map(np.asarray, params), spec,
                energy=args.energy, ranks=ranks, max_cost=args.max_cost)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        save_weights(args.out, fac_spec, fac_params, seen=seen)
        for e in report:
            print(f"  conv{e.layer_idx}: rank {e.rank}/{e.full_rank} "
                  f"(energy {e.energy_kept:.4f}, cost x{e.cost_ratio:.2f})")
        print(f"lowrank: factored {len(report)} convs at energy>="
              f"{args.energy:g}; params {n0 / 1e6:.1f}M -> "
              f"{num_params(fac_params) / 1e6:.1f}M")
        print(f"wrote {args.out}")
        import os
        out_cfg = args.out_cfg or os.path.splitext(args.out)[0] + ".cfg"
        with open(out_cfg, "w") as f:
            f.write(dump_cfg(fac_spec))
        print(f"wrote {out_cfg} (factored architecture — use it for "
              "eval/fine-tune)")
    else:  # l1_filter / bn_gamma / fpgm / taylor (structured pruning)
        criterion = _FILTER_MODE_CRITERION.get(args.mode, "l1")
        if (args.fraction is None and args.fractions is None
                and args.target_flops is None):
            print(f"error: --fraction, --fractions or --target-flops is "
                  f"required for {args.mode} mode", file=sys.stderr)
            return 2
        if args.target_flops is not None:
            if args.fraction is not None or args.fractions is not None:
                print("error: --target-flops replaces --fraction/"
                      "--fractions (it discovers the per-layer schedule "
                      "itself)", file=sys.stderr)
                return 2
        if args.tied == "group" and args.fractions is not None:
            # a silent fall-through would LOOK like group pruning ran
            print("error: --tied group composes with --fraction or "
                  "--target-flops, not a per-layer --fractions schedule "
                  "(tied groups share one keep-set, which has no "
                  "per-layer schedule)", file=sys.stderr)
            return 2
        if args.fraction is not None and not (0.0 <= args.fraction < 1.0):
            print(f"error: --fraction must be in [0, 1), got "
                  f"{args.fraction}", file=sys.stderr)
            return 2
        tay_scores = tay_gscores = tay_cscores = None
        if args.mode == "taylor":
            if not args.data:
                print("error: taylor mode needs --data (scores are "
                      "measured on training batches)", file=sys.stderr)
                return 2
            if args.target_flops is not None:
                # untied + tied-group + balanced-CSP gate scores from
                # ONE scoring pass (the budget allocator's full input)
                tay_scores, tay_gscores, tay_cscores = _taylor_scores(
                    args, spec, params, seen, full=True)
            elif args.tied == "group":
                # untied + group-summed gate scores from ONE scoring pass
                tay_scores, tay_gscores = _taylor_scores(
                    args, spec, params, seen, with_groups=True)
            else:
                tay_scores = _taylor_scores(args, spec, params, seen)
        if args.target_flops is not None:
            from modelcompression_tpu.compress import (
                csp_balanced_scores_device, filter_scores_device,
                flop_targeted_keep_sets, tied_group_scores_device,
                total_conv_flops,
            )
            scores = (tay_scores if args.mode == "taylor"
                      else filter_scores_device(params, spec,
                                                criterion=criterion))
            # balance-constrainable CSP grouped-route sources join the
            # allocation as balanced-step rank units (one per-block-
            # balanced drop per step — flops.flop_targeted_keep_sets
            # docstring), so yolov4-tiny's best pruning mode composes
            # with FLOP budgets instead of protecting the CSP sources
            cscores = (tay_cscores if args.mode == "taylor"
                       else csp_balanced_scores_device(
                           params, spec, criterion=criterion))
            gscores = None
            if args.tied == "group":
                # tied groups join the budget allocation as single rank
                # units (one shared keep-set per group; the FLOP delta of
                # a group filter spans every member)
                gscores = (tay_gscores if args.mode == "taylor"
                           else tied_group_scores_device(
                               params, spec, criterion=criterion))
            try:
                keep, sched = flop_targeted_keep_sets(
                    spec, scores, args.target_flops,
                    min_filters=args.min_filters, norm=args.score_norm,
                    group_scores=gscores, csp_scores=cscores)
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 2
            base_fl = total_conv_flops(spec)
            got_fl = total_conv_flops(spec,
                                      {i: len(k) for i, k in keep.items()})
            print(f"flop-targeted allocation ({args.mode}, "
                  f"norm={args.score_norm}): {base_fl / 1e9:.2f} -> "
                  f"{got_fl / 1e9:.2f} GFLOP/img ({got_fl / base_fl:.4f} "
                  f"of base, target {args.target_flops:g})")
            print("  discovered schedule (reusable as --fractions): "
                  + ",".join(f"{i}:{f:.3f}"
                             for i, f in sorted(sched.items())))
        elif args.fractions is not None:
            from modelcompression_tpu.compress import (
                keep_sets_from_scores, l1_filter_keep_sets_scheduled,
            )
            try:
                sched = {}
                for tok in args.fractions.split(","):
                    if not tok.strip():
                        continue
                    idx, _, val = tok.partition(":")
                    f = float(val)
                    if not 0.0 <= f < 1.0:
                        raise ValueError(f"fraction {f} out of [0, 1)")
                    sched[int(idx)] = f
                if args.mode == "taylor":
                    keep = keep_sets_from_scores(
                        tay_scores, fractions=sched,
                        default=args.fraction or 0.0)
                else:
                    keep = l1_filter_keep_sets_scheduled(
                        params, spec, sched, default=args.fraction or 0.0,
                        criterion=criterion)
                keep = {i: np.asarray(k) for i, k in keep.items()}
            except ValueError as e:
                print(f"error: bad --fractions: {e}", file=sys.stderr)
                return 2
        elif args.mode == "taylor":
            from modelcompression_tpu.compress import keep_sets_from_scores
            from modelcompression_tpu.compress.criteria import (
                _keep_from_scores,
            )
            keep = keep_sets_from_scores(tay_scores, args.fraction)
            if args.tied == "group":
                for g, s in tay_gscores.items():
                    ks = _keep_from_scores(np.asarray(s), args.fraction)
                    for i in g:
                        keep[i] = ks
        else:
            keep = uniform_filter_fraction_keep_sets(spec, params,
                                                     args.fraction,
                                                     criterion=criterion,
                                                     tied=args.tied)
        slim_spec, slim_params = repack(spec, params, keep)
        slim_params = jax.tree.map(np.asarray, slim_params)
        save_weights(args.out, slim_spec, slim_params, seen=seen)
        if args.target_flops is not None:
            what = (f"filters to a {args.target_flops:g} conv-FLOP budget "
                    "(auto per-layer allocation)")
        elif args.fractions is not None:
            what = f"per-layer schedule {args.fractions}"
        else:
            what = f"{args.fraction:.0%} of filters per prunable conv"
        print(f"{args.mode} prune: dropped {what}; "
              f"params {n0 / 1e6:.1f}M -> "
              f"{num_params(slim_params) / 1e6:.1f}M")
        print(f"wrote {args.out}")
        import os
        out_cfg = args.out_cfg or os.path.splitext(args.out)[0] + ".cfg"
        with open(out_cfg, "w") as f:
            f.write(dump_cfg(slim_spec))
        print(f"wrote {out_cfg} (slimmed architecture — use it for "
              "eval/fine-tune)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
