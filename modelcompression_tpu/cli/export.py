"""Export CLI — package the fused serving program as a TensorFlow
SavedModel (CPU/edge TF serving stacks) or, with ``--tflite``, as a
TensorFlow Lite flatbuffer for LiteRT mobile/edge runtimes.

What gets exported is the SAME one-program serving pipeline eval/detect
run on the TPU — normalize -> forward -> decode -> NMS -> source-pixel
coordinate mapping (evaluation/pipeline.make_eval_step) — converted with
``jax.experimental.jax2tf`` (native StableHLO serialization, lowered for
the requested platforms) with the weights baked into the graph as
constants. Serving the artifact needs TensorFlow only: no JAX, no
weights file, no Python from this repo.

The export is verified before the CLI returns: the SavedModel is loaded
back and run against the live JAX program on a random batch (both on
CPU), and the detection outputs must agree.

Example:
  export --cfg slim.cfg --weights slim.weights --out saved_model/ \
         --batch 1 --conf 0.25

Serving:
  m = tf.saved_model.load("saved_model/")
  boxes, scores, valid, n_cand, n_any = m.serve(images_u8, widths, heights)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from modelcompression_tpu.cli.common import (
    add_model_args, load_serving_model, prepare_serving,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="export", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    add_model_args(p, weights_required=False)
    p.add_argument("--qmodel", default=None, metavar="PATH",
                   help="export from an int8 deployment artifact instead "
                        "of --weights (int8 grids baked into the graph)")
    p.add_argument("--cmodel", default=None, metavar="PATH",
                   help="export from a weight-sharing artifact instead "
                        "of --weights")
    p.add_argument("--out", required=True, help="SavedModel directory")
    p.add_argument("--batch", type=int, default=1,
                   help="compiled serving batch size")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--nms", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=50,
                   help="top-K detections per class")
    p.add_argument("--platforms", default="cpu",
                   help="comma list of StableHLO lowering targets "
                        "(cpu, tpu, cuda); SavedModel only")
    p.add_argument("--tflite", action="store_true",
                   help="write a TensorFlow Lite flatbuffer instead of a "
                        "SavedModel: --out is the .tflite file. The SAME "
                        "fused serving program, converted via the jax HLO "
                        "bridge into BUILTIN TFLite ops only (no flex "
                        "delegate), so the artifact runs on stock LiteRT "
                        "mobile/edge runtimes. f32 compute (TFLite has no "
                        "bf16): --precision fast and --qmodel are "
                        "rejected; use --tflite-quantize for edge-side "
                        "weight compression")
    p.add_argument("--tflite-quantize", default="none",
                   choices=("none", "dynamic"),
                   help="'dynamic' = TFLite dynamic-range quantization "
                        "(int8 weights, float compute — the LiteRT-native "
                        "analog of this repo's qmodel; ~4x smaller file). "
                        "Verification becomes advisory (weights are "
                        "perturbed by design)")
    p.add_argument("--precision", default=None,
                   choices=("bitmatch", "fast"),
                   help="compute precision baked into the graph: "
                        "'bitmatch' (f32 — the natural CPU-serving dtype, "
                        "and tight verification; the --weights default) "
                        "or 'fast' (bf16, the TPU pipeline's dtype; TF's "
                        "XLA re-fuses the graph so near-threshold "
                        "detections may flip vs JAX and verification is "
                        "score-tolerant). --qmodel artifacts bake the "
                        "hybrid's own bf16 float convs, so bitmatch is "
                        "not available there")
    p.add_argument("--no-verify", action="store_true",
                   help="skip the reload-and-compare check")
    return p


def _export_tflite(serve, args, b: int, net_h: int, net_w: int) -> int:
    """Convert the fused serving program to a TFLite flatbuffer.

    The whole pipeline — letterbox matmuls, conv stack, decode, top-k NMS,
    source-pixel mapping — legalizes to BUILTIN TFLite ops at f32 (no
    flex/Select-TF ops), so the artifact runs on a stock LiteRT
    interpreter with XNNPACK. Verified here by reloading the flatbuffer
    and comparing against the live JAX program on a random batch.
    """
    import jax.numpy as jnp
    import tensorflow as tf

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (b, net_h, net_w, 3), dtype=np.uint8)
    ws = np.full((b,), float(net_w), np.float32)
    hs = np.full((b,), float(net_h), np.float32)

    conv = tf.lite.TFLiteConverter.experimental_from_jax(
        [serve], [[("images", images), ("width", ws), ("height", hs)]])
    if args.tflite_quantize == "dynamic":
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
    flatbuffer = conv.convert()
    with open(args.out, "wb") as f:
        f.write(flatbuffer)
    print(f"wrote TFLite flatbuffer to {args.out} "
          f"({len(flatbuffer) / 1e6:.2f} MB, batch {b}, {net_h}x{net_w}, "
          f"builtin ops only, "
          f"{'dynamic-range int8 weights' if args.tflite_quantize == 'dynamic' else 'f32 weights'})")
    if args.no_verify:
        return 0

    interp = tf.lite.Interpreter(model_content=flatbuffer)
    interp.allocate_tensors()
    ins = interp.get_input_details()
    # the converter may reorder inputs; match each tensor to exactly one
    # argument by declared-name substring — FIRST key wins per tensor and
    # each key is consumed once, so a name containing two keys cannot
    # steal another input's slot. Positional fallback is announced so a
    # verify mismatch stays attributable (ADVICE r3).
    feeds = (("images", images), ("width", ws), ("height", hs))
    by_index = {}
    used = set()
    for d in ins:
        for key, val in feeds:
            if key in d["name"] and key not in used:
                by_index[d["index"]] = val
                used.add(key)
                break
    if len(by_index) != len(ins):
        print(f"note: TFLite input names "
              f"{[d['name'] for d in ins]} did not match "
              "images/width/height 1:1 by substring; assigning "
              "positionally")
        by_index = {d["index"]: v for d, (_, v) in zip(ins, feeds)}
    for idx, val in by_index.items():
        interp.set_tensor(idx, val)
    interp.invoke()
    got = [interp.get_tensor(d["index"])
           for d in interp.get_output_details()]
    want = [np.asarray(t) for t in serve(jnp.asarray(images),
                                         jnp.asarray(ws), jnp.asarray(hs))]
    names = ("boxes", "scores", "valid", "n_cand", "n_any")
    # get_output_details() order is not contractually the JAX output
    # order: pair each expected output with the UNIQUE TFLite output of
    # the same (dtype-kind, shape) before comparing anything, so a
    # reordered model fails loudly here instead of feeding the advisory
    # stats below the wrong tensors (ADVICE r3)
    sig = lambda a: (np.dtype(a.dtype).kind, tuple(a.shape))
    remaining = list(range(len(got)))
    ordered = []
    for name, w in zip(names, want):
        match = [i for i in remaining if sig(got[i]) == sig(w)]
        if len(match) != 1:
            print(f"error: cannot pair TFLite output for {name} "
                  f"{sig(w)}: {len(match)} candidates among "
                  f"{[sig(got[i]) for i in remaining]}", file=sys.stderr)
            return 1
        ordered.append(got[match[0]])
        remaining.remove(match[0])
    got = ordered
    if args.tflite_quantize == "dynamic":
        # weights are perturbed by design — report drift, don't gate
        agree = float(np.mean(got[2] == want[2]))
        sdiff = float(np.max(np.abs(got[1] - want[1])))
        print(f"verify (dynamic-range, advisory): valid-flag agreement "
              f"{agree:.2%}, max score drift {sdiff:.2e}")
        return 0
    for name, g, w in zip(names, got, want):
        if not np.allclose(g, w, rtol=1e-5, atol=1e-4):
            print(f"error: verify mismatch on {name}: max diff "
                  f"{np.max(np.abs(g.astype(np.float64) - w.astype(np.float64)))}",
                  file=sys.stderr)
            return 1
    n = int(got[2].sum())
    print(f"verify ok: TFLite == JAX on a random batch ({n} detections)")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if sum(map(bool, (args.weights, args.qmodel, args.cmodel))) != 1:
        print("error: exactly one of --weights, --qmodel or --cmodel is "
              "required", file=sys.stderr)
        return 2
    if args.batch < 1:
        print(f"error: --batch must be >= 1, got {args.batch}",
              file=sys.stderr)
        return 2
    if args.tflite_quantize != "none" and not args.tflite:
        print("error: --tflite-quantize only applies with --tflite",
              file=sys.stderr)
        return 2
    if args.tflite and args.qmodel:
        # the qmodel hybrid's float convs are bf16 by construction and
        # TFLite builtins have no bf16 — the graph cannot legalize.
        # LiteRT-native int8 is --tflite-quantize dynamic instead.
        print("error: --tflite cannot export --qmodel artifacts (their "
              "hybrid float convs are bf16; TFLite has no bf16). Export "
              "from --weights/--cmodel with --tflite-quantize dynamic "
              "for an int8-weight edge artifact", file=sys.stderr)
        return 2
    if args.tflite and args.precision == "fast":
        print("error: --tflite requires f32 ('bitmatch') compute — "
              "TFLite has no bf16", file=sys.stderr)
        return 2
    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]

    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from jax.experimental import jax2tf

    from modelcompression_tpu.core.precision import BITMATCH, FAST
    from modelcompression_tpu.evaluation import EvalConfig, make_eval_step

    # everything here is host-side tracing + one CPU verification run;
    # stay off the TPU entirely (conversion must not depend on it)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        try:
            spec, params, quantized = load_serving_model(args)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        if quantized and args.precision == "bitmatch":
            # forward_quantized runs the hybrid's float convs in bf16
            # regardless of the EvalConfig precision — an f32 "bitmatch"
            # export of an int8 artifact would be a false claim
            print("error: --precision bitmatch is not available with "
                  "--qmodel (the artifact's hybrid float convs are "
                  "bf16); omit --precision or use --weights",
                  file=sys.stderr)
            return 2
        prec_name = args.precision or ("fast" if quantized
                                       else "bitmatch")
        precision = BITMATCH if prec_name == "bitmatch" else FAST
        cfg = EvalConfig(conf_thresh=args.conf, nms_thresh=args.nms,
                         max_detections=args.max_det, precision=precision)
        served = prepare_serving(spec, params, quantized, cfg)
        step = make_eval_step(spec, cfg)

        def serve(images, ws, hs):
            return step(served, images, ws, hs)

        b = args.batch
        net_h, net_w = spec.net.height, spec.net.width
        if args.tflite:
            return _export_tflite(serve, args, b, net_h, net_w)
        sig = [tf.TensorSpec((b, net_h, net_w, 3), tf.uint8, name="images"),
               tf.TensorSpec((b,), tf.float32, name="width"),
               tf.TensorSpec((b,), tf.float32, name="height")]
        f_tf = jax2tf.convert(serve, with_gradient=False,
                              native_serialization_platforms=platforms)
        module = tf.Module()
        module.serve = tf.function(f_tf, autograph=False,
                                   input_signature=sig)
        tf.saved_model.save(
            module, args.out,
            signatures={"serving_default":
                        module.serve.get_concrete_function(*sig)})
        print(f"wrote SavedModel to {args.out} "
              f"(batch {b}, {net_h}x{net_w}, platforms {platforms}, "
              f"{'int8 qmodel' if quantized else 'f32'} weights baked "
              f"in, {prec_name} compute)")

        if args.no_verify:
            return 0
        if "cpu" not in platforms:
            print("verify skipped: needs 'cpu' in --platforms")
            return 0
        rng = np.random.default_rng(0)
        images = rng.integers(0, 256, (b, net_h, net_w, 3), dtype=np.uint8)
        ws = np.full((b,), float(net_w), np.float32)
        hs = np.full((b,), float(net_h), np.float32)
        loaded = tf.saved_model.load(args.out)
        got = [np.asarray(t) for t in loaded.serve(images, ws, hs)]
        want = [np.asarray(t) for t in serve(jnp.asarray(images),
                                             jnp.asarray(ws),
                                             jnp.asarray(hs))]
        names = ("boxes", "scores", "valid", "n_cand", "n_any")
        if prec_name == "fast":
            # bf16 graphs (incl. every qmodel's hybrid float convs)
            # re-fuse under TF's XLA: near-threshold detections may flip
            # rows, so report drift instead of row-for-row equality
            agree = float(np.mean(got[2] == want[2]))
            sdiff = float(np.max(np.abs(got[1] - want[1])))
            print(f"verify (fast/bf16, advisory): valid-flag agreement "
                  f"{agree:.2%}, max score drift {sdiff:.2e}")
            return 0
        for name, g, w in zip(names, got, want):
            if not np.allclose(g, w, rtol=1e-5, atol=1e-4):
                print(f"error: verify mismatch on {name}: max diff "
                      f"{np.max(np.abs(g.astype(np.float64) - w.astype(np.float64)))}",
                      file=sys.stderr)
                return 1
        n = int(got[2].sum())
        print(f"verify ok: SavedModel == JAX on a random batch "
              f"({n} detections)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
