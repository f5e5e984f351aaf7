"""Eval CLI — VOC mAP@50 for a model on a dataset (the reference's
valid/eval script; BASELINE.json:5,7). Prints a per-class AP table and the
mAP, optionally dumping reference-format detection files.

Example:
  eval --cfg yolov2-voc.cfg --weights yolov2.weights --data voc.data \
       --batch 8 --dump-dir results/
"""

from __future__ import annotations

import argparse
import sys

from modelcompression_tpu.cli.common import (
    add_data_args, add_model_args, add_parallel_args, build_mesh,
    enable_compilation_cache, load_dataset, load_serving_model,
)
from modelcompression_tpu.core.precision import get_precision
from modelcompression_tpu.evaluation import (
    EvalConfig, dump_detections, evaluate,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="eval", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    add_model_args(p, weights_required=False)
    add_data_args(p)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--conf", type=float, default=0.005,
                   help="confidence threshold")
    p.add_argument("--nms", type=float, default=0.45, help="NMS IoU")
    p.add_argument("--max-det", type=int, default=100)
    p.add_argument("--nms-prefilter", type=int, default=0,
                   help="class-agnostic top-N' candidate prefilter before "
                        "the per-class NMS sorts (0 = off, the mAP "
                        "default). Exact while <= N' candidates/image "
                        "clear --conf (overflow is reported); measured "
                        "+10%% on the pruned deployment pipeline "
                        "(docs/PERF.md)")
    p.add_argument("--nms-prefilter-impl", choices=("topk", "bisect"),
                   default="topk",
                   help="prefilter implementation: 'topk' (per-image "
                        "lax.top_k sort) or 'bisect' (sort-free batched "
                        "segmented bit-bisection; same exactness "
                        "condition — evaluation/nms.py)")
    p.add_argument("--exact-nms", action="store_true",
                   help="exact greedy NMS over ALL candidates (no top-K "
                        "candidate prefilter; ~100 serial argmax rounds "
                        "per image-class — the mAP-audit switch). The "
                        "default top-k path equals greedy whenever at "
                        "most --max-det candidates clear --conf; every "
                        "run reports the overflow fraction either way")
    p.add_argument("--soft-nms", choices=("linear", "gaussian"),
                   default=None,
                   help="Soft-NMS (Bodla et al. 2017): decay overlapping "
                        "scores instead of erasing boxes — gaussian "
                        "s*=exp(-iou^2/sigma), linear s*=1-iou above "
                        "--nms. Accuracy knob for dense/overlapping "
                        "scenes; excludes --exact-nms/--nms-prefilter")
    p.add_argument("--soft-nms-sigma", type=float, default=0.5,
                   help="Gaussian soft-NMS temperature (default 0.5)")
    p.add_argument("--diou-nms", action="store_true",
                   help="DIoU-NMS (Zheng et al. 2020): suppress on "
                        "IoU - center-distance penalty > --nms — spares "
                        "far-apart boxes of equal overlap (occluded "
                        "objects). Same cost as plain greedy; composes "
                        "with --exact-nms/--nms-prefilter, excludes "
                        "--soft-nms")
    p.add_argument("--metric", choices=("07", "continuous"), default="07",
                   help="VOC AP protocol: 11-point (07) or all-point")
    p.add_argument("--map-iou", type=float, default=0.5,
                   help="AP matching IoU threshold (0.5 = the VOC/headline "
                        "protocol; e.g. 0.75 audits localization quality)")
    p.add_argument("--map-coco", action="store_true",
                   help="also report mAP@[.50:.95] (the COCO primary "
                        "metric's IoU-averaged shape; all-point AP over "
                        "IoU 0.50:0.05:0.95) from the same detections — "
                        "host-side only, no extra device work")
    p.add_argument("--recall", action="store_true",
                   help="recall audit instead of mAP (darknet 'detector "
                        "recall'): objectness-only proposals, class-"
                        "agnostic NMS, per-GT best-IoU; prints cumulative "
                        "RPs/Img, avg IoU, and recall@--recall-iou. "
                        "Darknet's knobs were --conf 0.001 --nms 0.4")
    p.add_argument("--recall-iou", type=float, default=0.5,
                   help="IoU above which a ground-truth box counts as "
                        "recalled (darknet uses 0.5)")
    p.add_argument("--precision", default="fast",
                   choices=("fast", "bitmatch"),
                   help="bitmatch = fp32/HIGHEST (bit-faithful, slower)")
    p.add_argument("--no-letterbox", action="store_true",
                   help="stretch-resize instead of letterbox")
    p.add_argument("--continuous-iou", action="store_true",
                   help="use continuous-coordinate IoU for AP matching "
                        "instead of the VOC devkit's +1 inclusive-pixel "
                        "convention (the default)")
    p.add_argument("--dump-dir", default=None,
                   help="write per-class detection files here")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 inference "
                        "(compress/quantize.py): per-channel int8 "
                        "weights, per-tensor int8 activations calibrated "
                        "on the first --calib-images eval images. "
                        "Incompatible with --precision bitmatch")
    p.add_argument("--calib-images", type=int, default=64,
                   help="images used for int8 activation calibration")
    p.add_argument("--calib-quantile", type=float, default=None,
                   help="calibrate activation scales at this quantile of "
                        "|activation| instead of the max (e.g. 0.9999 "
                        "sheds single-pixel outliers)")
    p.add_argument("--int8-layers", default="all",
                   help="which convs run int8 (hybrid mode): 'all', "
                        "'auto' (min(Cin,Cout) >= 128 — the measured "
                        "MXU-bound crossover, docs/PERF.md), 'auto:K' "
                        "for another channel threshold, or explicit "
                        "comma-separated layer indices; the rest run "
                        "bf16")
    p.add_argument("--save-qmodel", default=None, metavar="PATH",
                   help="with --int8: save the calibrated+quantized model "
                        "as ONE standalone deployment artifact (.npz with "
                        "the arch cfg embedded; ~4x smaller than the f32 "
                        ".weights). A later `eval --qmodel PATH` serves "
                        "it without the original weights or calibration "
                        "data")
    p.add_argument("--qmodel", default=None, metavar="PATH",
                   help="serve a saved int8 deployment artifact "
                        "(--save-qmodel) instead of --weights; bit-"
                        "identical to the run that saved it (no "
                        "recalibration)")
    p.add_argument("--cluster-bits", type=int, default=None,
                   metavar="BITS",
                   help="weight sharing (Deep Compression stage 2, "
                        "compress/codebook.py): k-means each conv's "
                        "weights into 2^BITS shared values before eval; "
                        "pruned zeros stay exact. Composes with --int8 "
                        "(cluster first, then quantize)")
    p.add_argument("--save-cmodel", default=None, metavar="PATH",
                   help="with --cluster-bits: save the clustered model "
                        "as ONE standalone artifact (codes + codebooks + "
                        "arch cfg; ~5x smaller than the f32 .weights). "
                        "Serve with eval/detect --cmodel")
    p.add_argument("--pack", nargs="?", const="huffman", default=None,
                   choices=("huffman", "fixed"), metavar="METHOD",
                   help="with --save-cmodel or --save-qmodel: entropy-"
                        "code the artifact's code/int8 tensors (Deep "
                        "Compression stage 3, compress/packing.py). "
                        "'huffman' (default) canonical-Huffman-codes "
                        "them — a pruned+shared YOLOv2 lands at ~2 "
                        "bits/weight; 'fixed' bit-packs to ceil(log2 K) "
                        "bits. Loading is transparent")
    p.add_argument("--cmodel", default=None, metavar="PATH",
                   help="serve a saved weight-sharing artifact "
                        "(--save-cmodel) instead of --weights; "
                        "reconstruction is exact, so detections match "
                        "the saving run bit-for-bit")
    add_parallel_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.exact_nms and args.nms_prefilter > 0:
        print("error: --exact-nms and --nms-prefilter are mutually "
              "exclusive — the exact path runs greedy NMS over ALL "
              "candidates, so a prefilter would silently not apply",
              file=sys.stderr)
        return 2
    if args.soft_nms and (args.exact_nms or args.nms_prefilter > 0):
        print("error: --soft-nms is mutually exclusive with --exact-nms/"
              "--nms-prefilter — those select variants of greedy erasure "
              "NMS, soft-NMS replaces the erasure rule itself",
              file=sys.stderr)
        return 2
    if args.soft_nms and args.diou_nms:
        print("error: --soft-nms and --diou-nms are mutually exclusive — "
              "DIoU changes the greedy erasure criterion, soft-NMS "
              "replaces erasure with score decay", file=sys.stderr)
        return 2
    if args.qmodel and (args.int8 or args.save_qmodel):
        print("error: --qmodel serves an already-quantized artifact; "
              "--int8/--save-qmodel (re)quantize from --weights — pick "
              "one direction", file=sys.stderr)
        return 2
    if args.save_qmodel and not args.int8:
        print("error: --save-qmodel requires --int8 (it saves the "
              "calibrated+quantized model)", file=sys.stderr)
        return 2
    if args.save_cmodel and args.cluster_bits is None:
        print("error: --save-cmodel requires --cluster-bits (it saves "
              "the clustered model)", file=sys.stderr)
        return 2
    if args.pack and not (args.save_cmodel or args.save_qmodel):
        print("error: --pack entropy-codes a saved artifact; it requires "
              "--save-cmodel or --save-qmodel", file=sys.stderr)
        return 2
    if args.cmodel and (args.cluster_bits is not None or args.qmodel):
        print("error: --cmodel serves an already-clustered artifact; "
              "it cannot combine with --cluster-bits or --qmodel",
              file=sys.stderr)
        return 2
    if args.qmodel and args.cluster_bits is not None:
        print("error: --cluster-bits re-clusters f32 weights; a --qmodel "
              "artifact is already int8 — cluster before/instead of "
              "quantizing", file=sys.stderr)
        return 2
    if sum(map(bool, (args.weights, args.qmodel, args.cmodel))) != 1:
        # exactly one (the detect CLI's rule too): with several given,
        # load_serving_model would serve the artifact and silently
        # ignore --weights — a silently-wrong mAP attribution
        print("error: exactly one of --weights, --qmodel or --cmodel is "
              "required", file=sys.stderr)
        return 2
    enable_compilation_cache()
    try:
        spec, params, _ = load_serving_model(args)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    if args.cluster_bits is not None:
        import jax
        import numpy as np

        from modelcompression_tpu.compress import (
            cluster_network, reconstruct, save_cmodel,
        )
        try:
            cmodel = cluster_network(jax.tree.map(np.asarray, params),
                                     spec, bits=args.cluster_bits)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        params = reconstruct(cmodel)
        print(f"weight sharing: {args.cluster_bits}-bit codebooks "
              f"(<= {1 << args.cluster_bits} shared values per conv)",
              file=sys.stderr)
        if args.save_cmodel:
            import os
            save_cmodel(args.save_cmodel, cmodel, spec, pack=args.pack)
            n_w = sum(int(np.asarray(e["codes"]).size)
                      for e in cmodel.values() if "codes" in e)
            size = os.path.getsize(args.save_cmodel)
            print(f"wrote weight-sharing artifact to {args.save_cmodel} "
                  f"({size / 1e6:.2f} MB"
                  + (f", {size * 8 / max(n_w, 1):.2f} bits/weight "
                     f"incl. f32 vectors+container; pack={args.pack}"
                     if args.pack else "") + ")",
                  file=sys.stderr)
    samples, names = load_dataset(args)
    if not samples:
        print("error: dataset is empty", file=sys.stderr)
        return 2
    precision = get_precision(args.precision)
    if (args.int8 or args.qmodel) and precision.name == "bitmatch":
        print("error: --int8/--qmodel is a quantized path; it cannot "
              "bit-match (--precision bitmatch)", file=sys.stderr)
        return 2
    cfg = EvalConfig(
        batch_size=args.batch, conf_thresh=args.conf, nms_thresh=args.nms,
        max_detections=args.max_det, use_07_metric=(args.metric == "07"),
        map_iou=args.map_iou, coco_map=args.map_coco,
        letterbox=not args.no_letterbox, precision=precision,
        devkit_iou=not args.continuous_iou,
        fold_bn=(precision.name != "bitmatch"),
        exact_nms=args.exact_nms, nms_prefilter=args.nms_prefilter,
        nms_prefilter_impl=args.nms_prefilter_impl,
        soft_nms=args.soft_nms or "", soft_nms_sigma=args.soft_nms_sigma,
        diou_nms=args.diou_nms)
    if args.int8:
        import numpy as np

        from modelcompression_tpu.compress import (
            forward_quantized, quantize_from_batches,
        )
        from modelcompression_tpu.cli.common import prep_calibration
        from modelcompression_tpu.models.darknet import fold_batchnorm

        try:
            int8_sel, chunks, n = prep_calibration(
                spec, samples, args.calib_images, args.int8_layers,
                letterbox=not args.no_letterbox, what="int8")
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        n_sel = ("all" if int8_sel is None else str(len(int8_sel)))
        print(f"int8: calibrating activation scales on {n} images "
              f"({n_sel} convs quantized)...", file=sys.stderr)
        folded = fold_batchnorm(params, spec)
        params = quantize_from_batches(
            folded, spec, chunks, quantile=args.calib_quantile,
            int8_layers=int8_sel)
        cfg.forward_fn = forward_quantized  # (p, x, s[, precision=FAST])
        if args.save_qmodel:
            from modelcompression_tpu.compress import save_qmodel
            save_qmodel(args.save_qmodel, params, spec, pack=args.pack)
            print(f"wrote int8 deployment artifact to {args.save_qmodel}",
                  file=sys.stderr)
    elif args.qmodel:
        from modelcompression_tpu.cli.common import prepare_serving
        params = prepare_serving(spec, params, True, cfg)
    if args.recall:
        if args.dump_dir or args.map_coco:
            print("error: --recall is an objectness-only audit — it "
                  "produces no per-class detections, so --dump-dir/"
                  "--map-coco do not apply", file=sys.stderr)
            return 2
        if args.exact_nms or args.nms_prefilter:
            print("error: --recall always uses the top-(--max-det) "
                  "class-agnostic proposal NMS (darknet detector recall "
                  "semantics); --exact-nms/--nms-prefilter do not apply "
                  "— raise --max-det to widen the proposal set",
                  file=sys.stderr)
            return 2
        if getattr(args, "dp", 0) > 1 or getattr(args, "tp", 1) > 1:
            print("error: --recall runs single-device; --dp/--tp do not "
                  "apply", file=sys.stderr)
            return 2
        if not 0.0 < args.recall_iou <= 1.0:
            print(f"error: --recall-iou must be in (0, 1], got "
                  f"{args.recall_iou}", file=sys.stderr)
            return 2
        from modelcompression_tpu.evaluation import evaluate_recall
        rres = evaluate_recall(params, spec, samples, cfg,
                               recall_iou=args.recall_iou, progress=True)
        print(rres.summary())
        return 0
    mesh, _ = build_mesh(args)
    if mesh is not None and args.batch % mesh.shape["data"]:
        print(f"error: --batch {args.batch} must be divisible by "
              f"--dp {mesh.shape['data']}", file=sys.stderr)
        return 2
    res = evaluate(params, spec, samples, names, cfg, mesh=mesh)
    print(res.summary())
    if args.dump_dir:
        dump_detections(res, args.dump_dir)
        print(f"wrote detection dumps to {args.dump_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
