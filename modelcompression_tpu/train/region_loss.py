"""YOLOv2 region loss — jittable, fixed shapes (SURVEY.md Appendix A.3).

Public YOLOv2 semantics (target assignment + loss scales from the [region]
cfg section, config-driven as Appendix A.3 requires):

* Every anchor box whose best IoU against all GT is below ``thresh`` gets a
  no-object loss ``noobject_scale * KL(0 || sigmoid(to))``; anchors above
  ``thresh`` that are not assigned to a GT get no objectness loss.
* Early training (seen < 12800 images): all anchors get a weak prior loss
  pulling boxes to their anchor shapes (scale 0.01).
* Each GT is assigned to the cell containing its center and the anchor with
  the best shape-only IoU — against the anchor priors when ``bias_match=1``
  (the cfg default), against the predicted w/h at that cell when
  ``bias_match=0`` (Darknet region_layer.c). Assigned anchors get:
    - coord loss: scale ``coord_scale * (2 - gw*gh)`` — KL-BCE on the
      logistic (tx, ty) logits vs fractional cell offsets, half squared
      error on the linear (tw, th) vs encoded targets,
    - objectness: ``object_scale * KL(iou || sigmoid(to))`` (``rescore``;
      the IoU is a stop-gradient target, as in Darknet; target 1
      otherwise),
    - class: softmax cross-entropy * ``class_scale`` (``softmax=1``) or
      half squared error on raw class outputs vs one-hot (``softmax=0``).

Every term is the antiderivative of the reference's ACTUAL update: Darknet
folds scales into ``delta = scale * (target - output)`` and backpropagates
delta without re-applying the logistic derivative, so the exact-parity
objective is cross-entropy for logistic outputs and half-SE for linear
ones — NOT ``scale*(t-sigmoid)^2``, whose gradient carries a spurious
sigmoid' factor that saturates (see _bce_kl; measured failure in
tests/test_learnability_v3.py's history).

TPU-first shape discipline: targets arrive as a fixed (B, M, 5) padded
array (rows with w == 0 are invalid); assignment is built with scatter
updates — no data-dependent Python control flow, one XLA program for the
whole loss (the reference computes this per-GT in Python loops,
SURVEY.md §3.4 hot loop).

When two GTs land on the same (cell, anchor), the later row wins (scatter
ordering) — matching the reference-class sequential overwrite.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from modelcompression_tpu.models.cfg import RegionLayer

PRIOR_SEEN_CUTOFF = 12800
PRIOR_SCALE = 0.01


def _bce_kl(z: jnp.ndarray, t) -> jnp.ndarray:
    """KL(t || sigmoid(z)) — the exact-gradient loss for the reference
    class's logistic outputs.

    Darknet's region/yolo layers activate x, y, obj (and the v3 classes)
    with LOGISTIC in the layer's forward, then backward_*_layer copies
    ``delta = scale * (target - output)`` straight to the previous layer
    WITHOUT multiplying by the logistic derivative (no gradient_array
    call) — so the reference's true update direction w.r.t. the
    pre-activation z is ``scale * (sigmoid(z) - t)``: exactly the BCE /
    cross-entropy gradient, NOT the MSE-on-sigmoid gradient
    ``2*scale*(sigmoid(z)-t)*sigmoid'(z)``.

    The extra sigmoid' factor is not a cosmetic difference: it vanishes
    at saturated logits, so an early noobj-dominated phase that pushes
    every objectness logit negative leaves positives unable to recover
    (measured on the v3 fixture: assigned sigma(to) collapses to 0.015 by
    step 50 and crawls to ~0.2 by step 600, mAP@50 0.22; with this form
    the same run converges — tests/test_learnability_v3.py).

    Value convention: the entropy of the (possibly soft) target is
    subtracted, making this the KL divergence — 0 at the optimum
    sigmoid(z) == t even for soft targets (fractional cell offsets,
    rescore IoU), positive for over/under-confidence. The subtraction is
    constant in z, so the gradient is exactly the reference delta.
    """
    t = jnp.asarray(t, jnp.float32)
    bce = jax.nn.softplus(z) - z * t
    ent = -(jax.scipy.special.xlogy(t, t)
            + jax.scipy.special.xlogy(1.0 - t, 1.0 - t))
    return bce - ent


def _pair_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU between (..., 4) center-format boxes (broadcasting)."""
    ax1 = boxes_a[..., 0] - boxes_a[..., 2] / 2
    ay1 = boxes_a[..., 1] - boxes_a[..., 3] / 2
    ax2 = boxes_a[..., 0] + boxes_a[..., 2] / 2
    ay2 = boxes_a[..., 1] + boxes_a[..., 3] / 2
    bx1 = boxes_b[..., 0] - boxes_b[..., 2] / 2
    by1 = boxes_b[..., 1] - boxes_b[..., 3] / 2
    bx2 = boxes_b[..., 0] + boxes_b[..., 2] / 2
    by2 = boxes_b[..., 1] + boxes_b[..., 3] / 2
    ix = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0)
    iy = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0)
    inter = ix * iy
    union = (jnp.maximum(ax2 - ax1, 0) * jnp.maximum(ay2 - ay1, 0)
             + jnp.maximum(bx2 - bx1, 0) * jnp.maximum(by2 - by1, 0) - inter)
    return jnp.where(union > 0, inter / union, 0.0)


@dataclasses.dataclass
class RegionLossMetrics:
    loss: jnp.ndarray
    loss_coord: jnp.ndarray
    loss_obj: jnp.ndarray
    loss_noobj: jnp.ndarray
    loss_cls: jnp.ndarray
    avg_iou: jnp.ndarray
    recall50: jnp.ndarray
    obj_conf: jnp.ndarray
    noobj_conf: jnp.ndarray
    n_gt: jnp.ndarray

    def as_dict(self) -> Dict[str, jnp.ndarray]:
        return dataclasses.asdict(self)


def region_loss(raw: jnp.ndarray, targets: jnp.ndarray,
                region: RegionLayer, seen: jnp.ndarray
                ) -> RegionLossMetrics:
    """Compute the region loss.

    Args:
      raw: (B, H, W, A*(5+C)) network output, float32.
      targets: (B, M, 5) rows [cls, cx, cy, w, h] normalized; w==0 invalid.
      region: [region] config.
      seen: scalar int — images seen so far (prior-loss gate).

    Returns RegionLossMetrics; ``loss`` is the scalar sum / batch.
    """
    b, h, w, _ = raw.shape
    a, c = region.num, region.classes
    if targets.shape[1] == 0:  # no GT slots at all: pad one invalid row so
        # every reduction below keeps a non-zero axis (static branch)
        targets = jnp.zeros((b, 1, 5), targets.dtype)
    m = targets.shape[1]
    raw = raw.reshape(b, h, w, a, 5 + c).astype(jnp.float32)
    anchors = jnp.asarray(region.anchor_pairs, jnp.float32)  # (A, 2)

    tx = jax.nn.sigmoid(raw[..., 0])
    ty = jax.nn.sigmoid(raw[..., 1])
    tw = raw[..., 2]
    th = raw[..., 3]
    to = jax.nn.sigmoid(raw[..., 4])
    cls_logits = raw[..., 5:]

    # decoded pred boxes (normalized) for IoU computations
    cy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    px = (tx + cx[None, :, :, None]) / w
    py = (ty + cy[None, :, :, None]) / h
    pw = anchors[None, None, None, :, 0] * jnp.exp(tw) / w
    ph = anchors[None, None, None, :, 1] * jnp.exp(th) / h
    pred_boxes = jnp.stack([px, py, pw, ph], -1)  # (B,H,W,A,4)

    gt_valid = targets[..., 3] > 0  # (B, M)
    gt_boxes = targets[..., 1:5]    # (B, M, 4) cx cy w h
    gt_cls = targets[..., 0].astype(jnp.int32)

    # ---- background mask: best IoU of each anchor vs all GT ----------------
    ious_all = _pair_iou(pred_boxes[:, :, :, :, None, :],
                         gt_boxes[:, None, None, None, :, :])  # (B,H,W,A,M)
    ious_all = jnp.where(gt_valid[:, None, None, None, :], ious_all, 0.0)
    best_iou = jnp.max(ious_all, axis=-1)  # (B,H,W,A)
    noobj_mask = best_iou < region.thresh

    # ---- GT assignment (scatter) ------------------------------------------
    gi = jnp.clip((gt_boxes[..., 0] * w).astype(jnp.int32), 0, w - 1)
    gj = jnp.clip((gt_boxes[..., 1] * h).astype(jnp.int32), 0, h - 1)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, m))
    # best anchor by shape-only IoU (boxes at origin). bias_match=1 (the
    # cfg default) compares against the anchor priors; bias_match=0 against
    # the PREDICTED w/h of each anchor at the GT's cell (Darknet
    # region_layer.c: pred.w = bias_match ? bias : out.w).
    gt_wh = jnp.stack([jnp.zeros_like(gt_boxes[..., 2]),
                       jnp.zeros_like(gt_boxes[..., 3]),
                       gt_boxes[..., 2] * w, gt_boxes[..., 3] * h], -1)
    if region.bias_match:
        anc_wh = jnp.concatenate([jnp.zeros_like(anchors), anchors], -1)
        shape_iou = _pair_iou(gt_wh[:, :, None, :],
                              anc_wh[None, None, :, :])
    else:
        pred_wh = jax.lax.stop_gradient(
            pred_boxes[batch_idx, gj, gi][..., 2:4])  # (B, M, A, 2) norm.
        pred_wh = pred_wh * jnp.asarray([w, h], jnp.float32)  # cell units
        pred_sh = jnp.concatenate([jnp.zeros_like(pred_wh), pred_wh], -1)
        shape_iou = _pair_iou(gt_wh[:, :, None, :], pred_sh)
    ga = jnp.argmax(shape_iou, axis=-1)  # (B, M)

    # scatter targets into (B, H, W, A) grids; invalid GT rows are routed to
    # an out-of-bounds row index and dropped by the scatter
    vw = gt_valid.astype(jnp.float32)
    # XLA leaves .at[].set with duplicate indices unspecified, so resolve
    # duplicates explicitly: when two valid GTs map to the same
    # (cell, anchor), only the LAST row scatters (reference-class
    # sequential overwrite). M is small, the (M, M) compare is free.
    key = (gj * w + gi) * a + ga  # (B, M) flat cell/anchor id
    later = jnp.arange(m)[None, :, None] < jnp.arange(m)[None, None, :]
    dup_later = jnp.any(
        later & gt_valid[:, None, :] & (key[:, :, None] == key[:, None, :]),
        axis=-1)  # (B, M): a later valid row claims the same slot
    wins = gt_valid & ~dup_later
    gj_s = jnp.where(wins, gj, h)  # h is out of bounds -> mode="drop"

    def scat(values, init=0.0):
        grid = jnp.full((b, h, w, a), init, jnp.float32)
        return grid.at[batch_idx, gj_s, gi, ga].set(values, mode="drop")

    assigned = jnp.zeros((b, h, w, a), jnp.bool_).at[
        batch_idx, gj_s, gi, ga].set(True, mode="drop")

    t_x = scat(gt_boxes[..., 0] * w - gi.astype(jnp.float32))
    t_y = scat(gt_boxes[..., 1] * h - gj.astype(jnp.float32))
    eps = 1e-9
    t_w = scat(jnp.log(jnp.maximum(gt_boxes[..., 2] * w, eps)
                       / anchors[ga][..., 0]))
    t_h = scat(jnp.log(jnp.maximum(gt_boxes[..., 3] * h, eps)
                       / anchors[ga][..., 1]))
    coord_w = scat(region.coord_scale
                   * (2.0 - gt_boxes[..., 2] * gt_boxes[..., 3]))
    t_cls = scat(gt_cls.astype(jnp.float32)).astype(jnp.int32)

    # IoU of the assigned predictor vs its GT (for rescore + metrics).
    # stop_gradient: the IoU is a TARGET — Darknet writes delta =
    # iou - sigmoid(to) with iou treated as a constant; letting gradients
    # flow through it would push assigned boxes to REDUCE their IoU
    # whenever iou > sigmoid(to).
    pred_at_gt = pred_boxes[batch_idx, gj, gi, ga]  # (B, M, 4)
    iou_at_gt = jax.lax.stop_gradient(
        _pair_iou(pred_at_gt, gt_boxes))            # (B, M)
    t_iou = scat(iou_at_gt)

    # ---- losses ------------------------------------------------------------
    # Exact-gradient convention (see _bce_kl): logistic outputs (x, y,
    # obj) take scale * KL(t || sigmoid(z)) — d/dz = scale*(sigmoid-t),
    # the reference's straight-through delta; linear outputs (w, h; raw
    # class scores when softmax=0) take scale/2 * (out - t)^2 — d/dout =
    # scale*(out-t), ditto. Softmax classes take plain CE, whose gradient
    # (prob - onehot) is already Darknet's delta.
    amask = assigned.astype(jnp.float32)
    zx, zy, zo = raw[..., 0], raw[..., 1], raw[..., 4]
    loss_coord = jnp.sum(coord_w * amask * (
        _bce_kl(zx, t_x) + _bce_kl(zy, t_y)
        + 0.5 * ((tw - t_w) ** 2 + (th - t_h) ** 2)))

    obj_target = t_iou if region.rescore else amask
    loss_obj = region.object_scale * jnp.sum(amask * _bce_kl(zo, obj_target))
    # background target 0: KL(0 || sigmoid(z)) == softplus(z)
    loss_noobj = region.noobject_scale * jnp.sum(
        jnp.where(noobj_mask & ~assigned, jax.nn.softplus(zo), 0.0))

    if region.softmax:
        log_probs = jax.nn.log_softmax(cls_logits, axis=-1)
        ce = -jnp.take_along_axis(log_probs, t_cls[..., None],
                                  axis=-1)[..., 0]
        loss_cls = region.class_scale * jnp.sum(amask * ce)
    else:
        # softmax=0: Darknet's delta_region_class without softmax writes
        # scale*(onehot - out) on the RAW (linear) class outputs
        onehot = jax.nn.one_hot(t_cls, c, dtype=jnp.float32)
        loss_cls = region.class_scale * 0.5 * jnp.sum(
            amask[..., None] * (onehot - cls_logits) ** 2)

    # prior loss: push every unassigned box toward its anchor early on
    prior_on = (seen < PRIOR_SEEN_CUTOFF).astype(jnp.float32)
    loss_prior = prior_on * PRIOR_SCALE * jnp.sum(
        (1 - amask) * (_bce_kl(zx, 0.5) + _bce_kl(zy, 0.5)
                       + 0.5 * (tw ** 2 + th ** 2)))

    n_gt = jnp.maximum(jnp.sum(vw), 1.0)
    total = (loss_coord + loss_obj + loss_noobj + loss_cls + loss_prior) / b

    return RegionLossMetrics(
        loss=total,
        loss_coord=loss_coord / b,
        loss_obj=loss_obj / b,
        loss_noobj=loss_noobj / b,
        loss_cls=loss_cls / b,
        avg_iou=jnp.sum(iou_at_gt * vw) / n_gt,
        recall50=jnp.sum((iou_at_gt > 0.5) * vw) / n_gt,
        obj_conf=jnp.sum(to * amask) / jnp.maximum(jnp.sum(amask), 1.0),
        noobj_conf=jnp.sum(to * (1 - amask))
        / jnp.maximum(jnp.sum(1 - amask), 1.0),
        n_gt=jnp.sum(vw))
