"""Detector recall audit — the TPU rebuild of Darknet's
``detector recall`` / validate_detector_recall (the reference-class
pipeline-sanity tool; SURVEY.md §2.1 repo-class standard, like detect).

Protocol (Darknet examples/detector.c semantics):

* decode all anchors, keep boxes whose OBJECTNESS clears ``conf_thresh``
  (class probabilities are never consulted — this audits localization,
  not classification);
* class-agnostic greedy NMS at ``nms_thresh``;
* proposals = surviving boxes per image;
* per ground-truth box: best continuous IoU over the proposals
  (darknet box_iou — NOT the devkit +1 matching convention, and
  ``difficult`` boxes are counted like any other, both darknet-faithful);
* correct when best IoU > ``recall_iou`` (0.5); report cumulative
  proposals/img, mean best-IoU, and recall.

TPU-first shape: forward + decode + objectness NMS + the per-GT best-IoU
reduction are ONE jitted program per batch; ground truth ships to the
device as a fixed-size padded (B, M, 4) pixel-coordinate array and only
the (B, M) best-IoU vector and tiny counters come back.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.data.preprocess import (
    letterbox_device, stretch_resize_device,
)
from modelcompression_tpu.data.voc import Sample
from modelcompression_tpu.evaluation.decode import (
    center_to_corners, corners_to_image, decode_heads,
)
from modelcompression_tpu.evaluation.nms import nms_topk, pairwise_iou
from modelcompression_tpu.evaluation.pipeline import EvalConfig, _prep_batch
from modelcompression_tpu.models.cfg import NetworkSpec
from modelcompression_tpu.models.darknet import (
    Params, fold_batchnorm, forward, forward_folded,
)


def make_recall_step(spec: NetworkSpec, config: EvalConfig,
                     src_hw: Optional[Tuple[int, int]] = None):
    """Jitted fn(params, images_uint8, img_w (B,), img_h (B,),
    gt_boxes (B, M, 4) source pixels, gt_mask (B, M) bool) ->
      (best_iou (B, M), proposals (B,) int32, n_cand (B,) int32).

    ``n_cand`` counts objectness candidates above conf_thresh per image —
    the top-k NMS prefilter's observability counter (candidates beyond
    ``max_detections`` cannot become proposals)."""
    spec.head_indices()  # validate heads exist ([region] or [yolo])
    net_h, net_w = spec.net.height, spec.net.width
    if config.forward_fn is not None:
        def fwd(p, x, s, prec):
            return config.forward_fn(p, x, s)
    elif config.fold_bn:
        def fwd(p, x, s, prec):
            return forward_folded(p, x, s, prec)
    else:
        fwd = forward
    from modelcompression_tpu.evaluation.pipeline import _resize_dtype
    rs_dtype = _resize_dtype(config.precision)

    def step(params: Params, images: jnp.ndarray, img_w: jnp.ndarray,
             img_h: jnp.ndarray, gt_boxes: jnp.ndarray,
             gt_mask: jnp.ndarray):
        if src_hw is not None:
            x = (letterbox_device(images, net_h, net_w, dtype=rs_dtype)
                 if config.letterbox
                 else stretch_resize_device(images, net_h, net_w,
                                            dtype=rs_dtype))
        else:
            x = images.astype(rs_dtype) / jnp.asarray(255.0, rs_dtype)
        raw = fwd(params, x, spec, config.precision)
        boxes, obj, _cls = decode_heads(raw, spec)
        corners = center_to_corners(boxes)
        n_cand = jnp.sum(obj > config.conf_thresh, axis=-1).astype(jnp.int32)
        sel, _scores, valid = jax.vmap(
            lambda b, s: nms_topk(b, s, iou_thresh=config.nms_thresh,
                                  score_thresh=config.conf_thresh,
                                  max_out=config.max_detections,
                                  exact_prefilter=config.exact_nms_prefilter)
        )(corners, obj)
        sel = corners_to_image(sel, img_w[:, None], img_h[:, None],
                               net_w, net_h, config.letterbox)
        iou = jax.vmap(pairwise_iou)(sel, gt_boxes)       # (B, K, M)
        iou = jnp.where(valid[:, :, None], iou, 0.0)
        best = jnp.where(gt_mask, jnp.max(iou, axis=1), 0.0)  # (B, M)
        proposals = jnp.sum(valid, axis=-1).astype(jnp.int32)
        return best, proposals, n_cand

    return jax.jit(step)


@dataclasses.dataclass
class RecallResult:
    n_images: int
    n_gt: int
    n_correct: int
    n_proposals: int
    iou_sum: float       # sum of per-GT best IoU (mean = iou_sum / n_gt)
    recall_iou: float
    images_per_sec: float = 0.0
    max_candidates: int = 0   # worst per-image objectness candidate count
    max_detections: int = 0

    @property
    def recall(self) -> float:
        return self.n_correct / self.n_gt if self.n_gt else 0.0

    @property
    def avg_iou(self) -> float:
        return self.iou_sum / self.n_gt if self.n_gt else 0.0

    @property
    def proposals_per_image(self) -> float:
        return self.n_proposals / self.n_images if self.n_images else 0.0

    def summary(self) -> str:
        lines = [
            f"recall@IoU>{self.recall_iou:g} (objectness-only, darknet "
            f"'detector recall' protocol): "
            f"{self.n_correct}/{self.n_gt} = {self.recall * 100:.2f}%",
            f"avg best-IoU per GT: {self.avg_iou * 100:.2f}%   "
            f"proposals/img: {self.proposals_per_image:.2f}   "
            f"[{self.n_images} images, "
            f"{self.images_per_sec:.1f} img/s pipeline wall]",
        ]
        if self.max_candidates > self.max_detections:
            lines.append(
                f"note: worst image had {self.max_candidates} objectness "
                f"candidates above threshold but NMS keeps top-"
                f"{self.max_detections} — raise --max-det (or --conf) if "
                f"proposals look truncated")
        return "\n".join(lines)


def evaluate_recall(params: Params, spec: NetworkSpec,
                    samples: Sequence[Sample], config: EvalConfig | None
                    = None, recall_iou: float = 0.5,
                    progress: bool = False) -> RecallResult:
    """Dataset recall audit (module docstring). Single-device: the audit
    is one forward per batch with tiny outputs — DP sharding buys nothing
    at audit scale."""
    config = config or EvalConfig()
    if config.fold_bn and config.forward_fn is None:
        params = fold_batchnorm(params, spec)
    step = make_recall_step(spec, config)
    net_h, net_w = spec.net.height, spec.net.width
    bs = config.batch_size

    # one static GT pad width for the whole run = one XLA program
    m_pad = max((len(s.labels) for s in samples), default=1)
    m_pad = max(8, -(-m_pad // 8) * 8)

    res = RecallResult(0, 0, 0, 0, 0.0, recall_iou,
                       max_detections=config.max_detections)
    t0 = time.perf_counter()
    for start in range(0, len(samples), bs):
        chunk = list(samples[start:start + bs])
        batch, img_w, img_h = _prep_batch(chunk, net_h, net_w,
                                          config.letterbox)
        pad_to = bs - len(chunk)
        if pad_to:
            batch = np.concatenate(
                [batch, np.zeros((pad_to, net_h, net_w, 3), np.uint8)])
            img_w = np.concatenate([img_w, np.ones(pad_to, np.float32)])
            img_h = np.concatenate([img_h, np.ones(pad_to, np.float32)])
        gt = np.zeros((bs, m_pad, 4), np.float32)
        mask = np.zeros((bs, m_pad), bool)
        for bi, s in enumerate(chunk):
            w, h = float(img_w[bi]), float(img_h[bi])
            for gi, row in enumerate(s.labels[:m_pad]):
                _cls, cx, cy, bw, bh = row
                gt[bi, gi] = ((cx - bw / 2) * w, (cy - bh / 2) * h,
                              (cx + bw / 2) * w, (cy + bh / 2) * h)
                mask[bi, gi] = True
        best, proposals, n_cand = jax.device_get(
            step(params, jnp.asarray(batch), jnp.asarray(img_w),
                 jnp.asarray(img_h), jnp.asarray(gt), jnp.asarray(mask)))
        nb = len(chunk)
        res.n_images += nb
        res.n_gt += int(mask[:nb].sum())
        res.n_correct += int((best[:nb][mask[:nb]] > recall_iou).sum())
        res.iou_sum += float(best[:nb][mask[:nb]].sum())
        res.n_proposals += int(proposals[:nb].sum())
        res.max_candidates = max(res.max_candidates,
                                 int(n_cand[:nb].max()) if nb else 0)
        if progress:  # darknet's cumulative per-batch line
            print(f"{res.n_images:5d}  {res.n_correct}/{res.n_gt}  "
                  f"RPs/Img: {res.proposals_per_image:.2f}  "
                  f"IoU: {res.avg_iou * 100:.2f}%  "
                  f"Recall: {res.recall * 100:.2f}%", flush=True)
    wall = time.perf_counter() - t0
    res.images_per_sec = res.n_images / wall if wall else 0.0
    return res
