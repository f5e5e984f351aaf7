"""End-to-end evaluation pipeline (SURVEY.md §3.1 rebuilt TPU-first).

The reference's eval loop is a per-image Python loop: host preprocess ->
CPU forward -> host decode -> O(n^2) numpy NMS -> detection files -> VOC AP
(SURVEY.md §3.1). Here the whole per-batch computation is ONE jitted XLA
program (BASELINE.json:5,11):

  [letterbox ->] normalize -> conv stack -> region decode -> per-class NMS
  -> map boxes back to source-image pixel coordinates

The host only feeds fixed-size uint8 batches plus per-image (w, h) arrays
and collects the (tiny) post-NMS detection lists, then runs the VOC AP
protocol (voc_map.py). Two ingestion modes:

* generic (``src_hw=None``): variable-size source images are letterboxed on
  host (cv2) to the net canvas — unavoidable for arbitrary-size JPEGs —
  and the device program starts at normalize.
* fused (``src_hw=(H, W)``): fixed-size sources are shipped raw and the
  letterbox itself runs on device inside the same program — the literal
  BASELINE.json:11 "fused letterbox+infer+decode+NMS" configuration.

All coordinate mapping happens on device (``decode.corners_to_image``), so
detections come back in source-image pixels — the same units ground truth
is stored in (one convention everywhere, including ``dump_detections``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.core.precision import Precision, FAST
from modelcompression_tpu.data.preprocess import (
    letterbox_device, letterbox_host, quantize_canvas,
    stretch_resize_device,
)
from modelcompression_tpu.data.streaming import prefetch_to_device
from modelcompression_tpu.data.voc import Sample
from modelcompression_tpu.evaluation.decode import (
    center_to_corners, corners_to_image, decode_heads,
)
from modelcompression_tpu.evaluation.nms import (
    batched_per_class_nms, batched_per_class_nms_padded,
    batched_per_class_nms_prefiltered, batched_per_class_soft_nms,
)
from modelcompression_tpu.evaluation.voc_map import (
    Detection, GroundTruth, mean_ap,
)
from modelcompression_tpu.models.cfg import NetworkSpec
from modelcompression_tpu.models.darknet import (
    Params, fold_batchnorm, forward, forward_folded,
)


@dataclasses.dataclass
class EvalConfig:
    batch_size: int = 8
    conf_thresh: float = 0.005  # low threshold for mAP (reference-class std)
    nms_thresh: float = 0.45
    max_detections: int = 100
    use_07_metric: bool = True
    # VOC devkit +1 inclusive-pixel IoU for AP matching (boxes here are in
    # source pixels, so the devkit convention is the parity-correct one)
    devkit_iou: bool = True
    # AP matching IoU threshold. 0.5 is the VOC/headline protocol
    # (BASELINE.json:2 mAP@50); other values give mAP@{75,...} for
    # localization-quality audits (COCO-style strictness)
    map_iou: float = 0.5
    # also compute mAP@[.50:.95] (the COCO primary metric's IoU-averaged
    # shape, voc_map.coco_map) from the same detection lists — a pure
    # host-side re-match, no extra device work
    coco_map: bool = False
    letterbox: bool = True
    precision: Precision = FAST
    fold_bn: bool = True
    # NMS candidate prefilter: True (default) = exact lax.top_k sort;
    # False = approx_max_k + exact top-K among survivors. MEASURED SLOWER
    # on this hardware at the production shape (1.21 vs 0.74 ms for
    # B=64,N=845,C=20,K=32 — approx_max_k lowers poorly under vmap;
    # docs/PERF.md "Explored and rejected") — kept as a knob for other
    # shape regimes, where N >> K makes the sort dominant.
    exact_nms_prefilter: bool = True
    # Exact greedy NMS over ALL candidates (evaluation/nms.nms_padded) —
    # no top-K candidate prefilter, so the result equals host greedy NMS
    # even when more than max_detections candidates clear conf_thresh
    # (only the OUTPUT is capped at max_detections survivors). ~100
    # serial argmax rounds per (image, class): measured ~7.4 ms/batch-64
    # extra on the pruned model, so it is the mAP-audit switch, not the
    # throughput default. The default top-k path equals greedy exactly
    # while <= max_detections candidates clear the threshold; every eval
    # reports nms_overflow_frac so the cap is observable, never silent
    # (SURVEY.md §7.4.2; VERDICT r1 #4).
    exact_nms: bool = False
    # Class-agnostic candidate prefilter before the per-class NMS sorts
    # (evaluation/nms.per_class_nms_prefiltered): one top-N' selection on
    # the max class score cuts N=grid*anchors before the C per-class
    # top-k sorts. 0 = off. Exact vs the unfiltered path whenever at
    # most N' candidates have any class above conf_thresh (the
    # n_cand counter makes the regime observable). Perf on chip:
    # docs/PERF.md "NMS class-agnostic prefilter".
    nms_prefilter: int = 0
    # Class-agnostic prefilter implementation: 'topk' (per-image
    # lax.top_k — lowers to a full per-image sort on TPU) or 'bisect'
    # (evaluation/nms.batched_bisect_prefilter — the segmented
    # bit-bisection the weight masks use, one batched O(N) selection
    # with no sort). Same exactness condition; kept SETs can differ
    # only on score ties at the N'-th value in the (already
    # approximate) overflow regime. Perf on chip: docs/PERF.md.
    nms_prefilter_impl: str = "topk"
    # Soft-NMS (Bodla et al. 2017, evaluation/nms.soft_nms_topk): decay
    # overlapping scores instead of erasing boxes — "" = off (classic
    # greedy), "gaussian" = s *= exp(-iou^2/soft_nms_sigma), "linear" =
    # s *= 1-iou above nms_thresh. An accuracy knob for dense scenes
    # (overlapping same-class objects survive with decayed scores);
    # inherently K serial decay rounds per (image, class), so it costs
    # more than the one-shot scan of the default path. Mutually
    # exclusive with exact_nms and nms_prefilter.
    soft_nms: str = ""
    soft_nms_sigma: float = 0.5
    # DIoU-NMS (Zheng et al. 2020, evaluation/nms): greedy suppression
    # on IoU - rho^2/c^2 > nms_thresh instead of plain IoU — the
    # center-distance penalty spares far-apart boxes of equal overlap
    # (occluded same-class objects). Still a static pairwise criterion,
    # so it rides the one-shot suppression scan at unchanged cost;
    # composes with exact_nms and nms_prefilter. Mutually exclusive
    # with soft_nms (that replaces the erasure rule itself).
    # diou_beta: exponent on the center-distance penalty,
    # (rho^2/c^2)^beta — darknet's diounms beta_nms knob (its cfgs ship
    # 0.6); 1.0 is the DIoU-NMS paper form. Ignored when diou_nms off.
    diou_nms: bool = False
    diou_beta: float = 1.0
    # conv1+pool as the fused phase-matmul op (ops/input_stage.py).
    # Default OFF: the reformulation is exact and tested, but measured
    # SLOWER than XLA's plain conv+pool on this toolchain (docs/PERF.md
    # "input stage" entry) — the Pallas form hits Mosaic layout limits and
    # the XLA form materializes im2col in HBM. Kept as an explicit knob
    # for future toolchains.
    fuse_input_stage: bool = False
    # Custom network forward: fn(params, x, spec) -> raw map, replacing
    # the standard folded/unfolded forward inside the same fused program.
    # The int8 inference path (compress/quantize.forward_quantized) plugs
    # in here with its quantized pytree as ``params``; fold_bn/precision
    # are ignored for the net when set (pre/post stages keep them).
    forward_fn: Optional[object] = None
    # Integer-domain input stage: the letterbox emits an INT8 canvas on
    # the network-input grid (quantize fused into the resize epilogue —
    # the 416² canvas moves through HBM at 1 byte/px and the first int8
    # conv consumes it with no separate quantize op). Requires a
    # ``forward_fn`` that accepts int8 input (forward_quantized does:
    # it reads the grid step from the pytree's __net__/input_scale, so
    # producer and consumer always share one scale). Bit-equal to the
    # float letterbox + the forward's own input quantize
    # (data/preprocess.quantize_canvas docstring; tests/test_quantize.py).
    int8_input: bool = False

    def __post_init__(self):
        if not 0.0 < self.map_iou <= 1.0:
            raise ValueError(f"map_iou must be in (0, 1], got {self.map_iou}")
        if self.exact_nms and self.nms_prefilter > 0:
            raise ValueError(
                "exact_nms and nms_prefilter are mutually exclusive: the "
                "exact path runs greedy NMS over ALL candidates, so a "
                "candidate prefilter would silently not apply — drop one "
                "of the two flags")
        if self.nms_prefilter_impl not in ("topk", "bisect"):
            raise ValueError(
                f"nms_prefilter_impl must be 'topk' or 'bisect', got "
                f"{self.nms_prefilter_impl!r}")
        if self.soft_nms not in ("", "linear", "gaussian"):
            raise ValueError(
                f"soft_nms must be '', 'linear' or 'gaussian', got "
                f"{self.soft_nms!r}")
        if self.soft_nms and (self.exact_nms or self.nms_prefilter > 0):
            raise ValueError(
                "soft_nms is mutually exclusive with exact_nms / "
                "nms_prefilter: those select variants of GREEDY erasure "
                "NMS, soft-NMS replaces the erasure rule itself")
        if self.soft_nms and self.diou_nms:
            raise ValueError(
                "soft_nms and diou_nms are mutually exclusive: diou_nms "
                "changes the greedy erasure criterion, soft_nms replaces "
                "erasure with score decay")
        if self.int8_input and self.forward_fn is None:
            raise ValueError(
                "int8_input requires a forward_fn that accepts an int8 "
                "canvas (compress.forward_quantized) — the standard "
                "float forward has no input grid to land on")


def _resize_dtype(precision):
    """Eval-input resize dtype for a precision policy (monkeypatchable
    seam for the on-chip A/B in tools/experiment_bf16_letterbox.py)."""
    import jax.numpy as _jnp
    return precision.compute_dtype if precision.name == "fast" \
        else _jnp.float32


def make_eval_step(spec: NetworkSpec, config: EvalConfig,
                   src_hw: Optional[Tuple[int, int]] = None):
    """Build the jitted device program (module docstring).

    Returns fn(params, images_uint8, img_w (B,), img_h (B,)) ->
      (boxes (B,C,K,4) in source-image pixels, scores (B,C,K),
       valid (B,C,K), n_cand (B,C) int32, n_any (B,) int32).
      The two counters make every truncation observable (VERDICT r1 #4,
      "no silent caps"):
      * n_cand — candidates above conf_thresh per (image, class);
        n_cand > K means the default top-k NMS saw more candidates than
        its per-class prefilter keeps.
      * n_any — candidates whose MAX class score clears conf_thresh per
        image; n_any > config.nms_prefilter means the class-agnostic
        prefilter (when enabled) truncated before the per-class sorts,
        so its exactness condition was violated even if every n_cand
        cell is within budget.

    ``images_uint8`` is (B, net, net, 3) when ``src_hw is None``, else
    (B, src_h, src_w, 3) raw source frames (letterbox fused on device).
    """
    spec.head_indices()  # validate: every spec has [region] or [yolo] heads
    net_h, net_w = spec.net.height, spec.net.width
    fuse = config.fuse_input_stage
    if fuse:
        from modelcompression_tpu.ops.input_stage import input_stage_match
        fuse = config.fold_bn and input_stage_match(spec)
    if config.forward_fn is not None:
        def fwd(p, x, s, prec):
            return config.forward_fn(p, x, s)
    elif config.fold_bn:
        def fwd(p, x, s, prec):
            return forward_folded(p, x, s, prec, fuse_input_stage=fuse)
    else:
        fwd = forward

    # FAST mode resizes in the conv compute dtype (bf16): the conv stack
    # rounds its input to bf16 anyway, so this only moves that rounding
    # one op earlier while halving the letterbox stage's HBM traffic.
    # BITMATCH keeps the resize in f32 (bit-faithful path).
    rs_dtype = _resize_dtype(config.precision)

    def step(params: Params, images: jnp.ndarray,
             img_w: jnp.ndarray, img_h: jnp.ndarray):
        # integer-domain input stage: quantize on the pytree's own input
        # grid, so recalibrated params change producer+consumer together
        qs = (params["__net__"]["input_scale"] if config.int8_input
              else None)
        if src_hw is not None:
            x = (letterbox_device(images, net_h, net_w, dtype=rs_dtype,
                                  quant_scale=qs)
                 if config.letterbox
                 else stretch_resize_device(images, net_h, net_w,
                                            dtype=rs_dtype,
                                            quant_scale=qs))
        else:
            x = images.astype(rs_dtype) / jnp.asarray(255.0, rs_dtype)
            if qs is not None:
                x = quantize_canvas(x, qs)
        raw = fwd(params, x, spec, config.precision)
        boxes, obj, cls = decode_heads(raw, spec)
        class_scores = obj[..., None] * cls  # (B, N, C)
        corners = center_to_corners(boxes)
        # truncation observability: candidates above threshold per
        # (image, class) — one cheap reduce fused into the program
        n_cand = jnp.sum(class_scores > config.conf_thresh,
                         axis=1).astype(jnp.int32)  # (B, C)
        # any-class candidate count — the class-agnostic prefilter's
        # exactness budget is per IMAGE, not per (image, class)
        n_any = jnp.sum(jnp.max(class_scores, axis=-1) > config.conf_thresh,
                        axis=-1).astype(jnp.int32)  # (B,)
        if config.soft_nms:
            sel, scores, valid = batched_per_class_soft_nms(
                corners, class_scores,
                iou_thresh=config.nms_thresh,
                score_thresh=config.conf_thresh,
                max_out=config.max_detections,
                sigma=config.soft_nms_sigma,
                linear=(config.soft_nms == "linear"))
        elif config.exact_nms:
            sel, scores, valid = batched_per_class_nms_padded(
                corners, class_scores,
                iou_thresh=config.nms_thresh,
                score_thresh=config.conf_thresh,
                max_out=config.max_detections,
                diou=config.diou_nms,
                diou_beta=config.diou_beta)
        elif config.nms_prefilter > 0:
            sel, scores, valid = batched_per_class_nms_prefiltered(
                corners, class_scores,
                iou_thresh=config.nms_thresh,
                score_thresh=config.conf_thresh,
                max_out=config.max_detections,
                prefilter=config.nms_prefilter,
                exact_prefilter=config.exact_nms_prefilter,
                diou=config.diou_nms,
                diou_beta=config.diou_beta,
                impl=config.nms_prefilter_impl)
        else:
            sel, scores, valid = batched_per_class_nms(
                corners, class_scores,
                iou_thresh=config.nms_thresh,
                score_thresh=config.conf_thresh,
                max_out=config.max_detections,
                exact_prefilter=config.exact_nms_prefilter,
                diou=config.diou_nms,
                diou_beta=config.diou_beta)
        # (B, C, K, 4) normalized -> source pixels, on device
        sel = corners_to_image(sel, img_w[:, None, None],
                               img_h[:, None, None],
                               net_w, net_h, config.letterbox)
        return sel, scores, valid, n_cand, n_any

    return jax.jit(step)


def _prep_batch(samples: Sequence[Sample], net_h: int, net_w: int,
                letterbox: bool, executor=None
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host side: decode + letterbox to a fixed uint8 canvas.

    ``executor``: optional ThreadPoolExecutor — image decode and cv2
    resize release the GIL, so per-image prep parallelizes across host
    cores (a real TPU host must letterbox ~15k img/s to keep the pruned
    pipeline fed; one thread tops out around 0.5-1k).

    Returns (batch (B,net,net,3) uint8, img_w (B,), img_h (B,))."""
    import cv2
    batch = np.zeros((len(samples), net_h, net_w, 3), np.uint8)
    img_w = np.ones(len(samples), np.float32)
    img_h = np.ones(len(samples), np.float32)

    def prep_one(i_s):
        i, s = i_s
        img = s.load_image()
        h, w = img.shape[:2]
        if letterbox:
            canvas, _, _, _ = letterbox_host(img, net_h, net_w)
        else:
            canvas = cv2.resize(img, (net_w, net_h),
                                interpolation=cv2.INTER_LINEAR)
        batch[i] = canvas
        img_w[i], img_h[i] = w, h

    if executor is not None:
        # list() propagates the first worker exception
        list(executor.map(prep_one, enumerate(samples)))
    else:
        for item in enumerate(samples):
            prep_one(item)
    return batch, img_w, img_h


def evaluate(params: Params, spec: NetworkSpec, samples: Sequence[Sample],
             class_names: Sequence[str], config: EvalConfig | None = None,
             mesh=None) -> "EvalResult":
    """Full dataset eval -> mAP@50 + per-class AP + throughput.

    All boxes (GT and detections) are kept in source-image pixel
    coordinates.

    ``mesh``: a mesh with a 'data' axis — params are replicated, batches
    sharded on 'data' (GSPMD DP inference, SURVEY.md §2.3; numerically
    identical to single-device, tests/test_parallel_eval.py). The batch
    size must divide the data axis."""
    config = config or EvalConfig()
    if config.fold_bn and config.forward_fn is None:
        # a custom forward owns its params' layout (e.g. the int8 pytree
        # is already BN-folded + quantized) — never re-fold it here
        params = fold_batchnorm(params, spec)
    step = make_eval_step(spec, config)
    net_h, net_w = spec.net.height, spec.net.width
    bs = config.batch_size
    shardings = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = mesh.shape.get("data", 1)
        if bs % dp:
            raise ValueError(
                f"eval batch {bs} not divisible by data-parallel size {dp}")
        params = jax.device_put(params, NamedSharding(mesh, P()))
        shardings = (NamedSharding(mesh, P("data", None, None, None)),
                     NamedSharding(mesh, P("data")),
                     NamedSharding(mesh, P("data")))

    dets: Dict[str, List[Detection]] = {c: [] for c in class_names}
    gts: Dict[str, List[GroundTruth]] = {c: [] for c in class_names}

    # per-image host prep fans out over host cores inside the prefetch
    # thread (decode/cv2 release the GIL); sized to the machine, 1-worker
    # degenerate case == the serial path
    import concurrent.futures
    import os as _os
    n_workers = max(1, min(16, _os.cpu_count() or 1))
    prep_pool = concurrent.futures.ThreadPoolExecutor(
        max_workers=n_workers) if n_workers > 1 else None

    def host_batches():
        """Producer: decode + letterbox + collate on host (runs in the
        prefetch thread, overlapped with device compute)."""
        for start in range(0, len(samples), bs):
            chunk = list(samples[start:start + bs])
            pad_to = bs - len(chunk)
            batch, img_w, img_h = _prep_batch(chunk, net_h, net_w,
                                              config.letterbox,
                                              executor=prep_pool)
            if pad_to:
                batch = np.concatenate(
                    [batch, np.zeros((pad_to, net_h, net_w, 3), np.uint8)])
                img_w = np.concatenate([img_w, np.ones(pad_to, np.float32)])
                img_h = np.concatenate([img_h, np.ones(pad_to, np.float32)])
            yield chunk, (batch, img_w, img_h)

    def put(item):
        chunk, arrs = item
        if shardings is not None:
            return chunk, tuple(jax.device_put(a, s)
                                for a, s in zip(arrs, shardings))
        return chunk, jax.tree.map(jax.device_put, arrs)

    n_images = 0
    t_loop0 = time.perf_counter()
    first_dev = []  # first batch's device arrays (single-batch steady timing)

    def batch_results():
        """Dispatch batch i, then fetch batch i-1's (tiny) outputs while
        the device computes — the output-side half of the §5.7
        double-buffering story (the input side is prefetch_to_device).
        On a high-latency link the fetch round-trip would otherwise
        serialize with compute."""
        pending = None
        for chunk, (batch, img_w, img_h) in prefetch_to_device(
                host_batches(), depth=2, put=put):
            if not first_dev:
                first_dev.append((batch, img_w, img_h))
            outs = step(params, batch, img_w, img_h)  # async dispatch
            if pending is not None:
                p_chunk, p_w, p_h, p_outs = pending
                yield p_chunk, p_w, p_h, jax.device_get(p_outs)
            pending = (chunk, np.asarray(img_w), np.asarray(img_h), outs)
        if pending is not None:
            p_chunk, p_w, p_h, p_outs = pending
            yield p_chunk, p_w, p_h, jax.device_get(p_outs)

    n_cells = 0
    n_overflow = 0
    max_cand = 0
    n_pf_overflow = 0
    max_any = 0
    n_batches = 0
    t_first = None
    n_first = 0
    try:
        for chunk, img_w, img_h, (boxes, scores, valid, n_cand, n_any) \
                in batch_results():
            n_batches += 1
            if t_first is None:
                # first results arriving marks the end of the one-off
                # costs (XLA compile — 20-50 s on the remote-compile TPU
                # path — plus first host prep/transfer); everything after
                # is the steady-state pipeline
                t_first = time.perf_counter()
                n_first = len(chunk)
            n_images += len(chunk)
            real = n_cand[:len(chunk)]  # exclude batch padding rows
            n_cells += real.size
            n_overflow += int((real > config.max_detections).sum())
            max_cand = max(max_cand, int(real.max()) if real.size else 0)
            real_any = n_any[:len(chunk)]
            max_any = max(max_any,
                          int(real_any.max()) if real_any.size else 0)
            if config.nms_prefilter > 0:
                n_pf_overflow += int((real_any > config.nms_prefilter).sum())

            for bi, s in enumerate(chunk):
                w, h = float(img_w[bi]), float(img_h[bi])
                # ground truth in source pixels (labels are normalized
                # cx cy w h)
                diff = (s.difficult if s.difficult is not None
                        else np.zeros(len(s.labels), bool))
                for row, d in zip(s.labels, diff):
                    cls, cx, cy, bw, bh = row
                    gts[class_names[int(cls)]].append(GroundTruth(
                        image_id=s.image_id,
                        box=((cx - bw / 2) * w, (cy - bh / 2) * h,
                             (cx + bw / 2) * w, (cy + bh / 2) * h),
                        difficult=bool(d)))
                for ci, cname in enumerate(class_names):
                    v = valid[bi, ci]
                    if not v.any():
                        continue
                    for k in np.nonzero(v)[0]:
                        dets[cname].append(Detection(
                            image_id=s.image_id,
                            score=float(scores[bi, ci, k]),
                            box=tuple(float(x) for x in boxes[bi, ci, k])))
    finally:
        if prep_pool is not None:
            prep_pool.shutdown(wait=True)

    # WALL time over the whole pipelined loop (prefetch puts + device
    # compute + output fetch + host accumulation), NOT device-only
    # inference time — images_per_sec is end-to-end pipeline throughput.
    # Chip-only throughput numbers come from bench.py's salted
    # min-over-windows methodology, never from here.
    t_end = time.perf_counter()
    wall_time = t_end - t_loop0
    # steady-state pipeline throughput: exclude the first batch (compile-
    # dominated on cold runs — on short fixture runs the overall figure
    # is effectively a compile measurement, VERDICT r2 weak #4). Single-
    # batch runs re-execute the already-compiled program once instead.
    compile_s = (t_first - t_loop0) if t_first is not None else 0.0
    if n_batches > 1 and t_first is not None:
        ips_steady = (n_images - n_first) / max(t_end - t_first, 1e-9)
    elif n_batches == 1 and first_dev:
        t0 = time.perf_counter()
        jax.device_get(step(params, *first_dev[0]))
        ips_steady = n_first / max(time.perf_counter() - t0, 1e-9)
    else:
        ips_steady = 0.0
    m, per_class = mean_ap(dets, gts, iou_thresh=config.map_iou,
                           use_07_metric=config.use_07_metric,
                           devkit_iou=config.devkit_iou)
    m_coco, per_class_coco, coco_area = (None, None, None)
    if config.coco_map:
        from modelcompression_tpu.evaluation.voc_map import (
            coco_map, coco_map_by_area,
        )
        m_coco, per_class_coco = coco_map(dets, gts,
                                          devkit_iou=config.devkit_iou)
        coco_area = coco_map_by_area(dets, gts,
                                     devkit_iou=config.devkit_iou)
    return EvalResult(
        map50=m, per_class_ap=per_class, detections=dets,
        n_images=n_images,
        images_per_sec=n_images / wall_time if wall_time else 0.0,
        images_per_sec_steady=ips_steady,
        compile_s=compile_s,
        use_07_metric=config.use_07_metric,
        map_iou=config.map_iou,
        nms_overflow_frac=(n_overflow / n_cells if n_cells else 0.0),
        nms_max_candidates=max_cand,
        max_detections=config.max_detections,
        exact_nms=config.exact_nms,
        nms_prefilter=config.nms_prefilter,
        prefilter_overflow_frac=(n_pf_overflow / n_images
                                 if n_images else 0.0),
        prefilter_max_candidates=max_any,
        map_coco=m_coco, per_class_ap_coco=per_class_coco,
        map_coco_area=coco_area)


@dataclasses.dataclass
class EvalResult:
    # mean AP at config.map_iou (the field name keeps the headline-metric
    # spelling; map_iou below records the threshold actually used)
    map50: float
    per_class_ap: Dict[str, float]
    detections: Dict[str, List[Detection]]
    n_images: int
    # end-to-end PIPELINE WALL throughput (host prep + transfers + device
    # compute + fetch); chip-only numbers are bench.py's job.
    # INCLUDES the first batch's one-off costs (XLA compile) — kept with
    # its historical semantics; use images_per_sec_steady for the figure
    # that excludes them.
    images_per_sec: float
    use_07_metric: bool
    # steady-state pipeline throughput: first batch excluded (single-batch
    # runs time one re-execution of the compiled program instead); the
    # number that means something on short runs
    images_per_sec_steady: float = 0.0
    # wall time until the first batch's results (host prep + transfer +
    # XLA compile + execute + fetch) — compile-dominated on cold TPU runs
    compile_s: float = 0.0
    map_iou: float = 0.5
    # NMS truncation observability ("no silent caps", VERDICT r1 #4):
    # fraction of (image, class) cells whose above-threshold candidate
    # count exceeded max_detections — cells where the default top-k NMS
    # can differ from exact greedy — plus the worst cell's count.
    nms_overflow_frac: float = 0.0
    nms_max_candidates: int = 0
    max_detections: int = 0
    exact_nms: bool = False
    # class-agnostic prefilter observability: its exactness budget is the
    # per-IMAGE any-class candidate count (nms.per_class_nms_prefiltered
    # docstring), which the per-(image,class) n_cand cells cannot bound —
    # fraction of images whose any-class count exceeded nms_prefilter,
    # plus the worst image's count (0 / 0.0 / max seen when prefilter off)
    nms_prefilter: int = 0
    prefilter_overflow_frac: float = 0.0
    prefilter_max_candidates: int = 0
    # mAP@[.50:.95] (voc_map.coco_map; None unless EvalConfig.coco_map)
    map_coco: Optional[float] = None
    per_class_ap_coco: Optional[Dict[str, float]] = None
    # COCO size-band diagnostics {small, medium, large} -> AP@[.50:.95]
    # (None for a band with no in-band GT); voc_map.coco_map_by_area,
    # populated alongside map_coco
    map_coco_area: Optional[Dict[str, float]] = None

    def summary(self) -> str:
        at = f"{self.map_iou * 100:g}"
        coco = self.per_class_ap_coco
        lines = [f"{'class':<16} AP@{at}"
                 + ("  AP@[.50:.95]" if coco is not None else "")]
        for c, ap in sorted(self.per_class_ap.items()):
            row = f"{c:<16} {ap * 100:6.2f}"
            if coco is not None:
                row += f"  {coco.get(c, 0.0) * 100:6.2f}"
            lines.append(row)
        proto = "11-point" if self.use_07_metric else "all-point"
        lines.append(f"mAP@{at} ({proto}): {self.map50 * 100:.2f}  "
                     f"[{self.n_images} images, "
                     f"{self.images_per_sec:.1f} img/s pipeline wall]")
        if self.images_per_sec_steady > 0.0:
            lines.append(
                f"throughput: {self.images_per_sec_steady:.1f} img/s "
                f"steady-state pipeline (first batch excluded: "
                f"{self.compile_s:.1f}s incl. XLA compile)")
        if self.map_coco is not None:
            lines.append(f"mAP@[.50:.95] (all-point, COCO IoU ladder): "
                         f"{self.map_coco * 100:.2f}")
        if self.map_coco_area is not None:
            lines.append("AP by object size: " + "  ".join(
                f"{band}={'n/a' if ap is None else f'{ap * 100:.2f}'}"
                for band, ap in self.map_coco_area.items()))
        if self.exact_nms:
            lines.append(
                f"NMS: exact greedy over all candidates "
                f"(worst cell {self.nms_max_candidates} candidates; "
                f"output capped at {self.max_detections} survivors)")
        else:
            exact_run = self.nms_overflow_frac == 0.0
            lines.append(
                f"NMS: top-{self.max_detections} prefilter; "
                f"{self.nms_overflow_frac:.2%} of (image,class) cells "
                f"exceeded it (worst {self.nms_max_candidates})")
            if self.nms_prefilter > 0:
                # the class-agnostic prefilter has its own (per-image)
                # exactness budget — both must hold for the exact claim
                exact_run = exact_run and self.prefilter_overflow_frac == 0.0
                lines.append(
                    f"NMS: class-agnostic prefilter {self.nms_prefilter}; "
                    f"{self.prefilter_overflow_frac:.2%} of images "
                    f"exceeded it (worst {self.prefilter_max_candidates} "
                    f"any-class candidates)")
            lines.append(
                "NMS: exact-equal to greedy NMS on this run" if exact_run
                else "NMS: re-run with exact_nms (eval --exact-nms) to audit")
        return "\n".join(lines)


def dump_detections(result: EvalResult, out_dir: str,
                    prefix: str = "comp4_det_test") -> None:
    """Write VOC-devkit-format per-class detection files (the reference's
    valid.py output shape, SURVEY.md §2.1 'VOC mAP eval'): one file per
    class, rows ``image_id score x1 y1 x2 y2`` in source-image pixel
    coordinates (the units evaluate() stores)."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    for cname, dets in result.detections.items():
        path = os.path.join(out_dir, f"{prefix}_{cname}.txt")
        with open(path, "w") as f:
            for d in sorted(dets, key=lambda d: -d.score):
                x1, y1, x2, y2 = d.box
                f.write(f"{d.image_id} {d.score:.6f} "
                        f"{x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f}\n")
