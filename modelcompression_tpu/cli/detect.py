"""Detect CLI — single-image inference with drawn boxes (the reference-class
demo script, SURVEY.md §2.1 'detect / demo', §3.5).

Example:
  detect --cfg yolov2-voc.cfg --weights yolov2.weights \
         --image dog.jpg --out prediction.png --conf 0.25
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.cli.common import (
    add_model_args, enable_compilation_cache, load_model,
)
from modelcompression_tpu.data.preprocess import letterbox_host
from modelcompression_tpu.data.voc import VOC_CLASSES, read_names
from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
from modelcompression_tpu.models import fold_batchnorm


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="detect", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    add_model_args(p, weights_required=False)
    p.add_argument("--image", required=True)
    p.add_argument("--out", default="prediction.png")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--nms", type=float, default=0.45)
    p.add_argument("--names", default=None, help=".names file")
    p.add_argument("--qmodel", default=None, metavar="PATH",
                   help="serve a saved int8 deployment artifact "
                        "(eval --int8 --save-qmodel) instead of --weights")
    p.add_argument("--cmodel", default=None, metavar="PATH",
                   help="serve a saved weight-sharing artifact "
                        "(eval --cluster-bits N --save-cmodel) instead "
                        "of --weights")
    return p


def main(argv=None) -> int:
    import cv2
    args = build_parser().parse_args(argv)
    if sum(map(bool, (args.weights, args.qmodel, args.cmodel))) != 1:
        print("error: exactly one of --weights, --qmodel or --cmodel is "
              "required", file=sys.stderr)
        return 2
    enable_compilation_cache()
    if args.qmodel:
        from modelcompression_tpu.compress import load_qmodel
        from modelcompression_tpu.models import load_cfg
        try:
            params, spec = load_qmodel(args.qmodel, spec=load_cfg(args.cfg))
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
    elif args.cmodel:
        from modelcompression_tpu.compress import load_cmodel
        from modelcompression_tpu.models import load_cfg
        try:
            params, spec = load_cmodel(args.cmodel,
                                       spec=load_cfg(args.cfg))
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
    else:
        spec, params, _ = load_model(args)
    names = read_names(args.names) if args.names else list(VOC_CLASSES)
    region = spec.region
    if len(names) != region.classes:
        names = [f"class{i}" for i in range(region.classes)]

    img = cv2.imread(args.image, cv2.IMREAD_COLOR)
    if img is None:
        print(f"error: cannot read image {args.image}", file=sys.stderr)
        return 2
    img_rgb = img[:, :, ::-1]
    h, w = img.shape[:2]
    net_h, net_w = spec.net.height, spec.net.width
    canvas, _, _, _ = letterbox_host(img_rgb, net_h, net_w)

    # ONE jitted program — the same fused eval step the pipeline uses
    # (normalize -> forward -> decode -> NMS -> source-pixel mapping);
    # eager per-op dispatch over the device link is never on a hot path.
    cfg = EvalConfig(conf_thresh=args.conf, nms_thresh=args.nms,
                     max_detections=50)
    if args.qmodel:  # already BN-folded + quantized at save time
        from modelcompression_tpu.compress import forward_quantized
        folded = jax.tree.map(jnp.asarray, params)
        cfg.forward_fn = lambda p, x, s: forward_quantized(p, x, s)
    else:
        folded = fold_batchnorm(jax.tree.map(jnp.asarray, params), spec)
    step = make_eval_step(spec, cfg)
    sel, out_scores, valid, _, _ = step(
        folded, jnp.asarray(canvas[None]),
        jnp.asarray([float(w)]), jnp.asarray([float(h)]))
    sel = np.asarray(sel)[0]          # already in source-image pixels
    out_scores = np.asarray(out_scores)[0]
    valid = np.asarray(valid)[0]

    n_drawn = 0
    for ci in range(region.classes):
        for k in np.nonzero(valid[ci])[0]:
            x1, y1, x2, y2 = (int(np.clip(v, 0, lim - 1)) for v, lim in
                              zip(sel[ci, k], (w, h, w, h)))
            color = tuple(int(c) for c in np.random.default_rng(ci)
                          .integers(60, 255, 3))
            cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
            label = f"{names[ci]} {out_scores[ci, k]:.2f}"
            cv2.putText(img, label, (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
            print(f"{names[ci]}: {out_scores[ci, k]:.3f} "
                  f"[{x1}, {y1}, {x2}, {y2}]")
            n_drawn += 1
    cv2.imwrite(args.out, img)
    print(f"{n_drawn} detections -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
