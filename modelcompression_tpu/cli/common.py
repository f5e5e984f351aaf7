"""Shared CLI plumbing (the public API mirrors the reference's
prune/fine-tune/eval scripts, BASELINE.json:5)."""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

from modelcompression_tpu.data.voc import (
    VOC_CLASSES, load_list_dataset, load_voc_devkit, read_data_cfg,
    read_names,
)
from modelcompression_tpu.models import (
    init_params, load_cfg, load_weights,
)


def enable_compilation_cache():
    """Persistent XLA compilation cache — OPT-IN via
    JAX_COMPILATION_CACHE_DIR=<path>. Default off: on this environment's
    remote-compile TPU tunnel the persistent cache was observed to hang
    compilation indefinitely (eval never finished with it on; finished in
    ~3 min without)."""
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    if not d or d.lower() in ("off", "0", "none"):
        return
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is best-effort
        print(f"[warn] compilation cache disabled: {e}", file=sys.stderr)


def add_model_args(p: argparse.ArgumentParser, weights_required=True):
    p.add_argument("--cfg", required=True, help="Darknet .cfg file")
    p.add_argument("--strict-cfg", action="store_true",
                   help="error (instead of warn) on cfg keys the parser "
                        "does not consume — keys the framework would "
                        "otherwise not act on (models/cfg.py audit)")
    p.add_argument("--weights", required=weights_required, default=None,
                   help="Darknet .weights file (omit for random init)")
    p.add_argument("--partial", action="store_true",
                   help="--weights is a backbone prefix (Darknet's "
                        ".conv.N convention): load the covered convs, "
                        "randomly initialize the rest")


def add_parallel_args(p: argparse.ArgumentParser):
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel size: shard the batch over this "
                        "many devices on the mesh's 'data' axis (GSPMD "
                        "inserts the collectives over ICI). 0 = "
                        "single-device (default)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size: shard conv filters over "
                        "the 'model' axis (train paths only)")


def build_mesh(args):
    """(mesh, tp_enabled) from --dp/--tp; (None, False) when unused."""
    dp = getattr(args, "dp", 0)
    tp = getattr(args, "tp", 1)
    if dp <= 1 and tp <= 1:
        return None, False
    from modelcompression_tpu.core.mesh import MeshConfig, make_mesh
    mesh = make_mesh(MeshConfig(data=max(dp, 1), model=max(tp, 1)))
    return mesh, tp > 1


def add_data_args(p: argparse.ArgumentParser):
    p.add_argument("--data", required=True,
                   help=".data file (train=/valid=/names=), VOCdevkit "
                        "root, or COCO instances_*.json")
    p.add_argument("--image-set", default="test",
                   help="VOCdevkit image set (when --data is a devkit root)")
    p.add_argument("--image-dir", default=None,
                   help="with a COCO --data json: image directory "
                        "(default: the standard <root>/<split>/ layout)")


def resolve_batch_subdivisions(args, spec):
    """Effective-batch semantics shared by the train and finetune CLIs
    (Darknet [net] batch/subdivisions, SURVEY.md §5.6).

    An explicit --batch without --subdivisions means "this IS the
    per-update batch, one forward": micro-batching is a memory knob the
    user can set separately; only the cfg-default path inherits the cfg's
    subdivisions (Darknet's effective-batch semantics). Explicit values
    are tested with ``is not None`` so ``--batch 0``/``--subdivisions 0``
    are rejected rather than silently falling back to the cfg.

    Returns (batch, subdivisions); raises ValueError on invalid combos.
    """
    if args.batch is not None and args.subdivisions is None:
        subdiv = 1
    elif args.subdivisions is not None:
        subdiv = args.subdivisions
    else:
        subdiv = spec.net.subdivisions
    batch = args.batch if args.batch is not None else spec.net.batch
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    if subdiv < 1:
        raise ValueError(f"subdivisions must be >= 1, got {subdiv}")
    if batch % subdiv:
        raise ValueError(f"batch {batch} must be divisible by "
                         f"subdivisions {subdiv}")
    return batch, subdiv


# bench.py's measured deployment configuration (docs/PERF.md headline:
# conf 0.01, K=32, class-agnostic NMS prefilter 128) — the --deployment
# preset makes the production serving surfaces reproduce the exact
# configuration the headline number is measured in (BASELINE.json:11).
DEPLOYMENT_PRESET = {"conf": 0.01, "max_detections": 32,
                     "nms_prefilter": 128}


def add_serving_nms_args(p: argparse.ArgumentParser):
    """The serving-surface NMS knob set shared by serve and detect (the
    eval CLI keeps its own mAP-protocol defaults). Defaults are None so
    --deployment can fill in the measured preset without clobbering
    explicit flags."""
    p.add_argument("--conf", type=float, default=None,
                   help="confidence threshold (default 0.25; "
                        "--deployment: 0.01)")
    p.add_argument("--nms", type=float, default=0.45, help="NMS IoU")
    p.add_argument("--max-detections", type=int, default=None,
                   help="per-class NMS output cap K (default 50; "
                        "--deployment: 32)")
    p.add_argument("--nms-prefilter", type=int, default=None,
                   help="class-agnostic top-N' candidate prefilter before "
                        "the per-class NMS sorts (0 = off, the default; "
                        "--deployment: 128). Measured +10-14%% on the "
                        "pruned pipeline (docs/PERF.md)")
    p.add_argument("--nms-prefilter-impl", choices=("topk", "bisect"),
                   default="topk",
                   help="prefilter implementation: 'topk' (per-image "
                        "lax.top_k sort) or 'bisect' (sort-free batched "
                        "segmented bit-bisection; same exactness "
                        "condition — evaluation/nms.py)")
    p.add_argument("--soft-nms", choices=("linear", "gaussian"),
                   default=None,
                   help="Soft-NMS score decay instead of greedy erasure "
                        "(accuracy knob for dense/overlapping scenes)")
    p.add_argument("--diou-nms", action="store_true",
                   help="DIoU-NMS: greedy suppression on IoU minus the "
                        "center-distance penalty (occluded objects). "
                        "Defaults ON when the cfg's [yolo] heads carry "
                        "nms_kind=diounms")
    p.add_argument("--diou-beta", type=float, default=None,
                   help="DIoU-NMS penalty exponent (rho^2/c^2)^beta "
                        "(darknet beta_nms; default 1.0, or the cfg's "
                        "beta_nms when nms_kind=diounms)")
    p.add_argument("--deployment", action="store_true",
                   help="apply bench.py's measured deployment "
                        "configuration (conf 0.01, K=32, NMS prefilter "
                        "128 — docs/PERF.md headline); explicit flags "
                        "still win")


def resolve_serving_eval_config(args, spec=None):
    """(serve/detect) --conf/--nms/--max-detections/--nms-prefilter/
    --soft-nms/--diou-nms/--deployment -> EvalConfig. Explicit flags
    override the --deployment preset; without --deployment the classic
    demo defaults (conf 0.25, K=50, prefilter off) apply.

    With ``spec``: the cfg's [yolo] ``nms_kind=diounms`` / ``beta_nms``
    keys become the NMS defaults (the cfg is the config system,
    SURVEY.md §5.6) — explicit --diou-nms/--diou-beta/--soft-nms flags
    still win."""
    from modelcompression_tpu.evaluation import EvalConfig
    preset = DEPLOYMENT_PRESET if getattr(args, "deployment", False) \
        else {"conf": 0.25, "max_detections": 50, "nms_prefilter": 0}

    def pick(name):
        v = getattr(args, name, None)
        return preset[name] if v is None else v

    diou = bool(getattr(args, "diou_nms", False))
    beta = getattr(args, "diou_beta", None)
    if spec is not None and not diou and not getattr(args, "soft_nms", None):
        diou_heads = [spec.layers[i] for i in spec.head_indices()
                      if getattr(spec.layers[i], "nms_kind", "") == "diounms"]
        if diou_heads:
            diou = True
            if beta is None:
                beta = diou_heads[0].beta_nms
    return EvalConfig(conf_thresh=pick("conf"), nms_thresh=args.nms,
                      max_detections=pick("max_detections"),
                      nms_prefilter=pick("nms_prefilter"),
                      nms_prefilter_impl=getattr(args, "nms_prefilter_impl",
                                                 "topk"),
                      soft_nms=args.soft_nms or "",
                      diou_nms=diou,
                      diou_beta=1.0 if beta is None else beta)


def resolve_mask_backend(args) -> str:
    """--use-pallas is an alias for --mask-backend pallas (prune and
    finetune CLIs share the flag pair)."""
    return "pallas" if getattr(args, "use_pallas", False) \
        else args.mask_backend


def load_model(args, seed: int = 0):
    spec = load_cfg(args.cfg, strict=getattr(args, "strict_cfg", False))
    partial = bool(getattr(args, "partial", False))
    if args.weights:
        params, seen = load_weights(args.weights, spec, partial=partial)
        params = jax.tree.map(np.asarray, params)
        if partial:
            # backbone-prefix init: covered convs come from the file, the
            # rest (detection head) from random init; seen restarts at 0
            # like Darknet training from a .conv.N backbone
            init = jax.tree.map(np.asarray,
                                init_params(spec, jax.random.key(seed)))
            n_loaded = len(params)
            params = {k: params.get(k, v) for k, v in init.items()}
            print(f"partial init: {n_loaded} convs from {args.weights}, "
                  f"{len(params) - n_loaded} randomly initialized")
            seen = 0
    else:
        params = jax.tree.map(np.asarray,
                              init_params(spec, jax.random.key(seed)))
        seen = 0
    return spec, params, seen


def load_dataset(args):
    """Returns (samples, class_names)."""
    data = args.data
    if os.path.isdir(data):  # VOCdevkit root
        return (load_voc_devkit(data, image_set=args.image_set),
                list(VOC_CLASSES))
    if data.endswith(".json"):  # COCO instances file (one split per file)
        from modelcompression_tpu.data.coco import load_coco_json
        return load_coco_json(data,
                              image_dir=getattr(args, "image_dir", None))
    cfg = read_data_cfg(data)
    names = read_names(cfg["names"]) if "names" in cfg else list(VOC_CLASSES)
    key = "valid" if "valid" in cfg else "train"
    return load_list_dataset(cfg[key]), names


def load_train_dataset(args):
    data = args.data
    if data.endswith(".json"):
        from modelcompression_tpu.data.coco import load_coco_json
        return load_coco_json(data,
                              image_dir=getattr(args, "image_dir", None))
    if os.path.isdir(data):
        # honor an explicit --image-set; 'test' is the eval-side default so
        # treat it as unset here and use the darknet training convention
        image_set = getattr(args, "image_set", None)
        if not image_set or image_set == "test":
            image_set = "trainval"
        return (load_voc_devkit(data, image_set=image_set),
                list(VOC_CLASSES))
    cfg = read_data_cfg(data)
    names = read_names(cfg["names"]) if "names" in cfg else list(VOC_CLASSES)
    key = "train" if "train" in cfg else "valid"
    return load_list_dataset(cfg[key]), names


def load_serving_model(args):
    """Resolve the serving-source trio --weights / --qmodel / --cmodel
    into ``(spec, params, quantized)`` — the one place eval and detect
    share artifact loading, so a format/guard change lands in both CLIs
    at once. ``quantized`` means params is an int8 QParams pytree whose
    forward is ``compress.forward_quantized`` (already BN-folded at save
    time). Raises ValueError on an architecture-guard mismatch."""
    if getattr(args, "qmodel", None):
        from modelcompression_tpu.compress import load_qmodel
        params, spec = load_qmodel(args.qmodel, spec=load_cfg(
            args.cfg, strict=getattr(args, "strict_cfg", False)))
        return spec, params, True
    if getattr(args, "cmodel", None):
        from modelcompression_tpu.compress import load_cmodel
        params, spec = load_cmodel(args.cmodel, spec=load_cfg(
            args.cfg, strict=getattr(args, "strict_cfg", False)))
        return spec, params, False
    spec, params, _ = load_model(args)
    return spec, params, False


def prepare_serving(spec, params, quantized: bool, cfg):
    """Finish what ``load_serving_model`` started: return the
    device-ready serving pytree and point ``cfg.forward_fn`` at the
    quantized forward when the artifact is int8 (already BN-folded at
    save time), else BN-fold the f32 params. The ONE place the
    eval/detect/export/deploy CLIs share this, so a change to the
    quantized-forward contract lands in all of them at once."""
    import jax
    import jax.numpy as jnp

    if quantized:
        from modelcompression_tpu.compress import forward_quantized
        cfg.forward_fn = forward_quantized  # (p, x, s[, precision=FAST])
        return jax.tree.map(jnp.asarray, params)
    from modelcompression_tpu.models import fold_batchnorm
    return fold_batchnorm(jax.tree.map(jnp.asarray, params), spec)


def dispatch_padded_batch(step, params, canvases, ws, hs, batch: int,
                          mesh=None):
    """DISPATCH the ONE fused serving program on a host-side gather,
    padding to the compiled batch size by repeating the last entry
    (padded rows are never read back per image). The single place
    ``detect --dir``, ``detect --video`` and the serve dispatcher share
    the padded-batch contract — including the exact input avals (uint8
    canvases, non-weak float32 sizes), so every caller hits the same
    compiled executable.

    ``mesh``: a mesh with a 'data' axis (serve --dp) — the batch arrays
    are placed sharded on 'data' (params must already be replicated on
    the mesh); GSPMD partitions the fused program over the devices, the
    BASELINE.json:11 "TPU slice" streaming shape.

    Returns the program's DEVICE outputs without blocking (JAX dispatch
    is async): callers overlap host work with device execution and call
    ``fetch_batch`` when they need the results — the same
    dispatch-then-fetch-previous pattern the eval pipeline uses
    (evaluation/pipeline.py batch_results)."""
    import jax.numpy as jnp
    canvases, ws, hs = list(canvases), list(ws), list(hs)
    while len(canvases) < batch:
        canvases.append(canvases[-1])
        ws.append(ws[-1])
        hs.append(hs[-1])
    imgs = np.stack(canvases)
    ws = np.asarray(ws, np.float32)
    hs = np.asarray(hs, np.float32)
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        imgs = jax.device_put(
            imgs, NamedSharding(mesh, P("data", None, None, None)))
        ws = jax.device_put(ws, NamedSharding(mesh, P("data")))
        hs = jax.device_put(hs, NamedSharding(mesh, P("data")))
    else:
        imgs, ws, hs = jnp.asarray(imgs), jnp.asarray(ws), jnp.asarray(hs)
    sel, sc, valid, _, _ = step(params, imgs, ws, hs)
    return sel, sc, valid


def fetch_batch(dev_outs):
    """Block on + read back a ``dispatch_padded_batch`` result as numpy
    (the device->host read forces execution)."""
    return tuple(np.asarray(a) for a in dev_outs)


def run_padded_batch(step, params, canvases, ws, hs, batch: int,
                     mesh=None):
    """dispatch_padded_batch + fetch_batch in one call (the synchronous
    convenience for single-shot callers like the serve warm-up)."""
    return fetch_batch(
        dispatch_padded_batch(step, params, canvases, ws, hs, batch,
                              mesh=mesh))


def unpack_detections(sel, scores, valid, w, h):
    """One image's padded-NMS output ``(C, K, 4)`` -> list of detection
    dicts in source-image pixel coordinates, boxes clipped to the image
    extent, sorted by score descending. Shared by serve and detect so
    the clip/unpack convention lives in one place."""
    dets = []
    for ci in range(sel.shape[0]):
        for k in np.nonzero(valid[ci])[0]:
            x1, y1, x2, y2 = (float(np.clip(v, 0, lim)) for v, lim in
                              zip(sel[ci, k], (w, h, w, h)))
            dets.append({"class_id": int(ci),
                         "score": float(scores[ci, k]),
                         "box": [x1, y1, x2, y2]})
    dets.sort(key=lambda d: -d["score"])
    return dets


def prep_calibration(spec, samples, n_images: int, selector: str,
                     letterbox: bool = True, what: str = "int8"):
    """Shared eval/finetune calibration plumbing: resolve AND validate
    the conv-layer selector up front (before any host prep or the 20-50s
    remote calibration compile), then prepare fixed-size image chunks.

    Returns ``(int8_sel, chunks, n_images_used)``. Chunks are all
    exactly 8 images (ONE calibration XLA program, bounded memory); the
    tail chunk pads by cycling its own images rather than dropping the
    remainder — absmax calibration is invariant under duplication, and
    a quantile sees at most 7 duplicated images. Raises ValueError with
    a clean message on a malformed selector or non-conv indices.
    """
    from modelcompression_tpu.compress.quantize import (
        _resolve_int8_set, resolve_int8_layers,
    )
    from modelcompression_tpu.evaluation.pipeline import _prep_batch
    try:
        int8_sel = resolve_int8_layers(spec, selector)
    except ValueError as e:
        raise ValueError(
            f"bad --{what}-layers selector {selector!r}: {e}") from e
    _resolve_int8_set(spec, int8_sel)  # index validation BEFORE any work
    n = max(1, min(n_images, len(samples)))
    batch, _, _ = _prep_batch(samples[:n], spec.net.height,
                              spec.net.width, letterbox=letterbox)
    chunks = []
    for i in range(0, batch.shape[0], 8):
        ch = batch[i:i + 8]
        if ch.shape[0] < 8:
            reps = int(np.ceil(8 / ch.shape[0]))
            ch = np.concatenate([ch] * reps, axis=0)[:8]
        chunks.append(ch.astype(np.float32) / 255.0)
    return int8_sel, chunks, n
