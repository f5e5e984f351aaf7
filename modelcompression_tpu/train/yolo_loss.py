"""YOLOv3 multi-head [yolo] loss — jittable, fixed shapes.

Public Darknet ``yolo_layer.c`` semantics (the v3 counterpart of
train/region_loss.py, which documents the shared scatter formulation):

* Every predictor whose best IoU against all GT is below ``ignore_thresh``
  gets a no-object loss ``KL(0 || sigmoid(to))``; predictors above it that
  are not assigned to a GT get NO objectness loss (the ignore band).
* Each GT picks the best shape-only-IoU anchor among ALL ``num`` anchors
  of the shared pixel-unit list; the GT is assigned ONLY in the head whose
  ``mask`` contains that anchor (at the cell holding the GT center on that
  head's grid). Assigned predictors get:
    - coord loss: scale ``(2 - gw*gh)`` — KL-BCE on the logistic
      (tx, ty) logits vs fractional offsets, half squared error on the
      linear (tw, th) vs encoded targets; tw/th encode against the anchor
      in NETWORK-INPUT pixels (``log(gw*net_w / anchor_w)``), v3's anchor
      convention (models/cfg.YoloLayer);
    - objectness: ``KL(1 || sigmoid(to))`` (v3 has no rescore option);
    - class: independent per-class sigmoids — summed per-class BCE
      against the one-hot row (Darknet's delta_yolo_class; multi-label,
      NOT a softmax CE).
* No early-training prior loss and no cfg loss scales: [yolo] has none of
  [region]'s object/noobject/class/coord_scale knobs.

Loss convention (region_loss._bce_kl): every term is the antiderivative
of Darknet's actual update — yolo_layer.c activates x/y/obj/classes with
LOGISTIC in forward and backward copies ``delta = scale*(t - output)``
straight through (no logistic-derivative multiply), so the exact-parity
objective is cross-entropy on the logits, NOT MSE on the sigmoids. The
MSE surrogate's extra sigmoid' factor saturates: on the v3 fixture the
initial noobj phase pins every objectness logit negative and assigned
sigma(to) plateaus at ~0.2 after 600 steps (mAP@50 0.22 vs >=0.8 with
this form) — the failure that motivated the switch.

``truth_thresh < 1`` (Darknet's unused multi-truth experiment: every
predictor whose best-GT IoU exceeds it is also trained as a positive) is
NOT implemented — every public yolov3 cfg ships ``truth_thresh = 1``,
which makes the branch dead; a spec that enables it fails loudly here
rather than silently training a different objective.

YOLOv4 loss keys (models/cfg.YoloLayer; AlexeyAB-darknet [yolo]):

* ``iou_loss = giou|diou|ciou`` replaces the coord term with the
  IoU-based regression penalty ``iou_normalizer * (1 - XIoU)`` per
  assigned predictor (Rezatofighi et al. 2019 GIoU; Zheng et al. 2020
  DIoU/CIoU). The (2 - gw*gh) size weight applies only to the MSE form
  (darknet's delta_yolo_box uses it in the MSE branch only). Gradient
  follows darknet's EXACT delta convention, which truncates the chain
  rule (see ``_iou_box_penalty`` + the surrogate in ``yolo_loss``):
  the x/y gradients land on the logits unchanged (no sigmoid' — the
  layer's backward never applies it — and no scale_x_y/grid factor),
  and the w/h gradients carry ONLY the ``exp(raw)`` factor (darknet's
  ``dw *= exp(x[...])`` drops the anchor/net scale of the true chain
  rule). ``max_delta`` clips the four coord deltas symmetrically AFTER
  ``iou_normalizer`` (darknet's order).
* ``cls_normalizer`` scales the OBJECTNESS deltas (obj and noobj). This
  is the yolov4-release darknet behavior: despite the name,
  ``l.cls_normalizer`` multiplies ``delta[obj_index]`` in
  forward_yolo_layer while delta_yolo_class leaves the per-class deltas
  unscaled; the separate ``obj_normalizer`` knob postdates the v4 cfgs.
  Both canonical v4 cfgs ship 1.0, so the quirk is only visible to
  custom cfgs — documented here so nobody "fixes" it into a divergence.
* ``iou_thresh < 1`` (full yolov4.cfg ships 0.213) enables darknet's
  MULTI-ANCHOR assignment: besides its best global anchor, a GT also
  trains every anchor slot whose shape-only IoU clears the threshold,
  at the GT's cell in the head owning that anchor. Implemented by
  flattening (GT, slot) pairs into M*A scatter rows per head (GT-major,
  so the last-row-wins duplicate rule stays darknet's sequential
  overwrite); iou_thresh=1 reduces exactly to the classic best-only
  rule. Unlike ``truth_thresh`` (prediction-IoU based, dead in every
  public cfg, rejected loudly), iou_thresh is anchor-shape based and
  live in yolov4.cfg — so it must work, not just be reported.

TPU-first shape discipline: identical to region_loss — (B, M, 5) padded
targets, scatter-built assignment grids, duplicate (cell, anchor) slots
resolved last-row-wins, one XLA program covering ALL heads (the per-head
grids are static shapes from the spec).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.models.cfg import NetworkSpec, YoloLayer
from modelcompression_tpu.train.region_loss import (
    RegionLossMetrics, _bce_kl, _pair_iou, region_loss,
)


def _iou_box_penalty(kind: str, px, py, pw, ph, tx, ty, tw, th):
    """Elementwise IoU-family box penalty ``1 - XIoU`` on center-format
    normalized boxes (pred vs target grids), with the published gradient
    conventions built in so plain autodiff of this function yields the
    darknet/paper partials w.r.t. the DECODED pred coords:

    * ``giou``: 1 - (IoU - (C - U)/C), C = enclosing-box area
      (Rezatofighi et al. 2019).
    * ``diou``: 1 - IoU + rho^2/c^2 — center distance over the squared
      enclosing-box diagonal (Zheng et al. 2020).
    * ``ciou``: DIoU + alpha*v aspect-ratio term, with the paper's two
      gradient conventions: (1) alpha is a CONSTANT in the backward
      (stop_gradient); (2) d atan(pw/ph)/d{pw,ph} = {ph, -pw} — the
      paper replaces the true 1/(pw^2+ph^2) factor by 1 ("dominant
      gradient direction", avoids the small-box explosion; darknet's
      ar_dw/ar_dh implement the same). Built as a linearized surrogate
      whose value equals the true atan and whose autodiff yields exactly
      those partials.

    Every division is eps-guarded so cells whose target row is empty
    (tw == th == 0, masked out by the caller) contribute finite values —
    0 * finite, never 0 * NaN, in both the forward and the VJP.
    """
    sg = jax.lax.stop_gradient
    eps = 1e-9
    pl, pr = px - pw * 0.5, px + pw * 0.5
    pt, pb = py - ph * 0.5, py + ph * 0.5
    tl, tr = tx - tw * 0.5, tx + tw * 0.5
    tt, tb = ty - th * 0.5, ty + th * 0.5
    iw = jnp.maximum(jnp.minimum(pr, tr) - jnp.maximum(pl, tl), 0.0)
    ih = jnp.maximum(jnp.minimum(pb, tb) - jnp.maximum(pt, tt), 0.0)
    inter = iw * ih
    union = pw * ph + tw * th - inter
    iou = inter / jnp.maximum(union, eps)
    cw = jnp.maximum(pr, tr) - jnp.minimum(pl, tl)
    ch = jnp.maximum(pb, tb) - jnp.minimum(pt, tt)
    if kind == "giou":
        c_area = cw * ch
        return 1.0 - (iou - (c_area - union) / jnp.maximum(c_area, eps))
    c2 = cw * cw + ch * ch
    s2 = (px - tx) ** 2 + (py - ty) ** 2
    dterm = s2 / jnp.maximum(c2, eps)
    if kind == "diou":
        return 1.0 - iou + dterm
    if kind != "ciou":
        raise ValueError(f"unknown iou_loss kind {kind!r}")
    atan_p = jnp.arctan(pw / jnp.maximum(ph, eps))
    # surrogate: value == atan_p, d/dpw == ph, d/dph == -pw (convention 2)
    lin = pw * sg(ph) - ph * sg(pw)
    atan_p = sg(atan_p) + lin  # lin's VALUE is identically 0
    atan_t = jnp.arctan(tw / jnp.maximum(th, eps))
    v = (4.0 / np.pi ** 2) * (atan_t - atan_p) ** 2
    alpha = sg(v / jnp.maximum(1.0 - iou + v, eps))  # convention 1
    return 1.0 - iou + dterm + alpha * v


def _head_layers(spec: NetworkSpec) -> Tuple[YoloLayer, ...]:
    heads = tuple(spec.layers[i] for i in spec.head_indices())
    anchors0 = heads[0].anchors
    for h in heads:
        if not isinstance(h, YoloLayer):
            raise ValueError("yolo_loss needs [yolo] heads (use "
                             "region_loss for [region] specs)")
        if h.anchors != anchors0:
            raise ValueError(
                "[yolo] heads must share one anchor list (the mask= "
                "selects each scale's subset from it)")
        if h.truth_thresh < 1.0:
            raise ValueError(
                f"truth_thresh={h.truth_thresh} < 1 (multi-truth "
                "assignment) is not supported; every public yolov3 cfg "
                "uses truth_thresh=1")
    return heads


def yolo_loss(raws: Sequence[jnp.ndarray], targets: jnp.ndarray,
              spec: NetworkSpec) -> RegionLossMetrics:
    """Compute the summed multi-head [yolo] loss.

    Args:
      raws: per-scale raw maps in network order (what ``forward`` returns
        for a multi-head spec), each (B, Hk, Wk, Ak*(5+C)) float32.
      targets: (B, M, 5) rows [cls, cx, cy, w, h] normalized; w==0 pads.
      spec: the network spec (head layers + net input size).

    Returns RegionLossMetrics (the shared train-metrics contract);
    ``loss`` is the scalar sum over heads / batch.
    """
    heads = _head_layers(spec)
    if len(raws) != len(heads):
        raise ValueError(f"spec has {len(heads)} [yolo] heads but got "
                         f"{len(raws)} raw maps")
    net_h, net_w = spec.net.height, spec.net.width
    b = raws[0].shape[0]
    if targets.shape[1] == 0:  # keep reductions on a non-empty axis
        targets = jnp.zeros((b, 1, 5), targets.dtype)
    m = targets.shape[1]

    gt_valid = targets[..., 3] > 0  # (B, M)
    gt_boxes = targets[..., 1:5].astype(jnp.float32)
    gt_cls = targets[..., 0].astype(jnp.int32)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, m))

    # best anchor per GT over the FULL shared anchor list (pixel units,
    # shape-only IoU at origin) — decides WHICH head assigns the GT
    all_anchors = jnp.asarray(
        [(heads[0].anchors[2 * k], heads[0].anchors[2 * k + 1])
         for k in range(heads[0].num)], jnp.float32)  # (num, 2)
    gt_wh = jnp.stack([jnp.zeros_like(gt_boxes[..., 2]),
                       jnp.zeros_like(gt_boxes[..., 3]),
                       gt_boxes[..., 2] * net_w,
                       gt_boxes[..., 3] * net_h], -1)  # (B, M, 4)
    anc_wh = jnp.concatenate([jnp.zeros_like(all_anchors), all_anchors], -1)
    shape_iou = _pair_iou(gt_wh[:, :, None, :], anc_wh[None, None, :, :])
    ga_global = jnp.argmax(shape_iou, axis=-1)  # (B, M) in [0, num)

    zero = jnp.zeros((), jnp.float32)
    acc = dict(coord=zero, obj=zero, noobj=zero, cls=zero,
               iou_sum=zero, recall=zero, wins=zero,
               to_obj=zero, n_obj=zero, to_noobj=zero, n_noobj=zero)

    for layer, raw in zip(heads, raws):
        _, h, w, _ = raw.shape
        a, c = layer.n, layer.classes
        raw = raw.reshape(b, h, w, a, 5 + c).astype(jnp.float32)
        anchors = jnp.asarray(layer.anchor_pairs, jnp.float32)  # (A, 2) px

        tx = jax.nn.sigmoid(raw[..., 0])
        ty = jax.nn.sigmoid(raw[..., 1])
        tw = raw[..., 2]
        th = raw[..., 3]
        to = jax.nn.sigmoid(raw[..., 4])

        cy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        cx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        # scale_x_y: decode matches evaluation/decode.decode_yolo —
        # offset = s*sigmoid(t) - (s-1)/2 (YOLOv4 grid-sensitivity fix)
        s_xy = layer.scale_x_y
        off_xy = (s_xy - 1.0) * 0.5
        px = (s_xy * tx - off_xy + cx[None, :, :, None]) / w
        py = (s_xy * ty - off_xy + cy[None, :, :, None]) / h
        pw = anchors[None, None, None, :, 0] * jnp.exp(tw) / net_w
        ph = anchors[None, None, None, :, 1] * jnp.exp(th) / net_h
        pred_boxes = jnp.stack([px, py, pw, ph], -1)  # (B,H,W,A,4)

        # ignore band: predictors overlapping ANY GT above ignore_thresh
        # get no objectness penalty even when unassigned
        ious_all = _pair_iou(pred_boxes[:, :, :, :, None, :],
                             gt_boxes[:, None, None, None, :, :])
        ious_all = jnp.where(gt_valid[:, None, None, None, :], ious_all, 0.0)
        best_iou = jnp.max(ious_all, axis=-1)  # (B,H,W,A)
        noobj_mask = best_iou < layer.ignore_thresh

        # per-slot eligibility (B, M, A): a GT trains this head's slot s
        # when s holds its best GLOBAL anchor — and, under darknet's
        # multi-anchor assignment ([yolo] iou_thresh < 1; yolov4.cfg
        # ships 0.213), ALSO when slot s's own anchor clears the
        # shape-IoU threshold. iou_thresh=1 (default) reduces exactly to
        # the classic best-only rule.
        slot_of = np.full((layer.num,), -1, np.int32)
        for s, g in enumerate(layer.mask):
            slot_of[g] = s
        slot_best = jnp.asarray(slot_of)[ga_global]  # (B, M), -1 = other
        sl = jnp.arange(a)
        elig = gt_valid[:, :, None] & (slot_best[:, :, None] == sl)
        if layer.iou_thresh < 1.0:
            head_iou = shape_iou[:, :, jnp.asarray(layer.mask, jnp.int32)]
            elig = elig | (gt_valid[:, :, None]
                           & (head_iou > layer.iou_thresh))

        gi1 = jnp.clip((gt_boxes[..., 0] * w).astype(jnp.int32), 0, w - 1)
        gj1 = jnp.clip((gt_boxes[..., 1] * h).astype(jnp.int32), 0, h - 1)

        # flatten the (GT, slot) pairs into m2 = M*A rows, GT-major with
        # slot minor, so the later-row-wins duplicate rule below remains
        # darknet's sequential per-GT overwrite (two rows of the SAME GT
        # never collide — distinct anchors give distinct keys)
        m2 = m * a

        def rows(x):  # (B, M, ...) -> (B, M*A, ...), tiled per slot
            return jnp.repeat(x, a, axis=1)

        ga2 = jnp.tile(sl, (b, m))            # (B, M*A): row r -> r % a
        wins0 = elig.reshape(b, m2)
        gi = rows(gi1)
        gj = rows(gj1)
        gt_boxes2 = rows(gt_boxes)            # (B, M*A, 4)
        gt_cls2 = rows(gt_cls)
        batch_idx2 = jnp.broadcast_to(jnp.arange(b)[:, None], (b, m2))

        # duplicate (cell, anchor) slots: last valid row wins (the
        # reference-class sequential overwrite; see region_loss)
        key = (gj * w + gi) * a + ga2
        later = (jnp.arange(m2)[None, :, None]
                 < jnp.arange(m2)[None, None, :])
        dup_later = jnp.any(
            later & wins0[:, None, :] & (key[:, :, None] == key[:, None, :]),
            axis=-1)
        wins = wins0 & ~dup_later
        gj_s = jnp.where(wins, gj, h)  # out of bounds -> mode="drop"

        def scat(values):
            grid = jnp.zeros((b, h, w, a), jnp.float32)
            return grid.at[batch_idx2, gj_s, gi, ga2].set(values,
                                                          mode="drop")

        assigned = jnp.zeros((b, h, w, a), jnp.bool_).at[
            batch_idx2, gj_s, gi, ga2].set(True, mode="drop")

        eps = 1e-9
        t_cls = scat(gt_cls2.astype(jnp.float32)).astype(jnp.int32)
        amask = assigned.astype(jnp.float32)
        zx, zy, zo = raw[..., 0], raw[..., 1], raw[..., 4]

        if layer.iou_loss == "mse":
            t_x = scat(gt_boxes2[..., 0] * w - gi.astype(jnp.float32))
            t_y = scat(gt_boxes2[..., 1] * h - gj.astype(jnp.float32))
            t_w = scat(jnp.log(jnp.maximum(gt_boxes2[..., 2] * net_w, eps)
                               / anchors[ga2][..., 0]))
            t_h = scat(jnp.log(jnp.maximum(gt_boxes2[..., 3] * net_h, eps)
                               / anchors[ga2][..., 1]))
            coord_w = scat(2.0 - gt_boxes2[..., 2] * gt_boxes2[..., 3])

            # exact-gradient terms (module docstring / _bce_kl):
            # KL-BCE on logistic logits, half-SE on the linear tw/th.
            # scale_x_y: darknet's delta (wrt the logit, via its
            # no-sigmoid' convention times the scal_add factor s) is
            #   s*(t - (s*sig - (s-1)/2)) = s^2 * ((t + (s-1)/2)/s - sig),
            # i.e. the gradient of s^2 * BCE with the RESCALED target
            # t' = (t + (s-1)/2)/s — implemented exactly below (t' stays
            # in [0,1] because the fractional target is, and s >= 1).
            t_x_s = (t_x + off_xy) / s_xy
            t_y_s = (t_y + off_xy) / s_xy
            acc["coord"] += jnp.sum(coord_w * amask * (
                s_xy * s_xy * (_bce_kl(zx, t_x_s) + _bce_kl(zy, t_y_s))
                + 0.5 * ((tw - t_w) ** 2 + (th - t_h) ** 2)))
        else:
            # IoU-family regression loss (iou_loss = giou|diou|ciou).
            # Value: iou_normalizer * sum(1 - XIoU) over assigned
            # predictors. Gradient: darknet's delta_yolo_box convention
            # EXACTLY — the penalty gradients w.r.t. the DECODED box
            # (from autodiff of _iou_box_penalty, conventions inside)
            # land on the raw outputs with darknet's truncated chain
            # rule: x/y straight onto the logits (no sigmoid', no
            # scale_x_y/grid factor), w/h times exp(raw) only (the
            # anchor/net factor of the true chain rule is dropped, as
            # darknet's `dw *= exp(x[...])` does). max_delta clips the
            # deltas AFTER iou_normalizer (darknet's order). The
            # linearized surrogate below has exactly that gradient while
            # its VALUE contribution is the true penalty sum.
            sg = jax.lax.stop_gradient
            tbx = scat(gt_boxes2[..., 0])
            tby = scat(gt_boxes2[..., 1])
            tbw = scat(gt_boxes2[..., 2])
            tbh = scat(gt_boxes2[..., 3])
            iou_n = layer.iou_normalizer

            def _pen_sum(bx, by, bw, bh):
                return jnp.sum(amask * _iou_box_penalty(
                    layer.iou_loss, bx, by, bw, bh, tbx, tby, tbw, tbh))

            val, grads = jax.value_and_grad(_pen_sum, argnums=(0, 1, 2, 3))(
                sg(px), sg(py), sg(pw), sg(ph))
            gx, gy, gw, gh = grads
            deltas = [iou_n * gx, iou_n * gy,
                      iou_n * gw * jnp.exp(sg(tw)),
                      iou_n * gh * jnp.exp(sg(th))]
            if np.isfinite(layer.max_delta):
                deltas = [jnp.clip(t, -layer.max_delta, layer.max_delta)
                          for t in deltas]
            deltas = [sg(t * amask) for t in deltas]
            lin = jnp.sum(deltas[0] * zx + deltas[1] * zy
                          + deltas[2] * tw + deltas[3] * th)
            acc["coord"] += sg(iou_n * val) + lin - sg(lin)

        # cls_normalizer scales the OBJECTNESS deltas (module docstring:
        # the yolov4-release darknet multiplies delta[obj_index] by
        # l.cls_normalizer — obj AND noobj — while class deltas stay
        # unscaled; default 1.0 keeps the classic v3 behavior exactly)
        cn = layer.cls_normalizer
        acc["obj"] += cn * jnp.sum(amask * jax.nn.softplus(-zo))
        acc["noobj"] += cn * jnp.sum(  # KL(0||s(zo))
            jnp.where(noobj_mask & ~assigned, jax.nn.softplus(zo), 0.0))
        onehot = jax.nn.one_hot(t_cls, c, dtype=jnp.float32)
        acc["cls"] += jnp.sum(amask[..., None]
                              * _bce_kl(raw[..., 5:], onehot))

        # metrics: IoU of each winning (GT, slot) row's predictor (a
        # TARGET for reporting only — see region_loss's stop_gradient
        # rationale). With iou_thresh < 1 the rows include the extra
        # multi-anchor positives, so avg_iou/recall50 normalize over all
        # trained positives (identical to the classic per-GT metrics
        # when iou_thresh = 1, the default).
        pred_at_gt = pred_boxes[batch_idx2, gj, gi, ga2]
        iou_at_gt = jax.lax.stop_gradient(_pair_iou(pred_at_gt, gt_boxes2))
        vw = wins.astype(jnp.float32)
        acc["iou_sum"] += jnp.sum(iou_at_gt * vw)
        acc["recall"] += jnp.sum((iou_at_gt > 0.5) * vw)
        acc["wins"] += jnp.sum(vw)
        acc["to_obj"] += jnp.sum(to * amask)
        acc["n_obj"] += jnp.sum(amask)
        acc["to_noobj"] += jnp.sum(to * (1 - amask))
        acc["n_noobj"] += jnp.sum(1 - amask)

    n_assigned = jnp.maximum(acc["wins"], 1.0)
    total = (acc["coord"] + acc["obj"] + acc["noobj"] + acc["cls"]) / b
    return RegionLossMetrics(
        loss=total,
        loss_coord=acc["coord"] / b,
        loss_obj=acc["obj"] / b,
        loss_noobj=acc["noobj"] / b,
        loss_cls=acc["cls"] / b,
        avg_iou=acc["iou_sum"] / n_assigned,
        recall50=acc["recall"] / n_assigned,
        obj_conf=acc["to_obj"] / jnp.maximum(acc["n_obj"], 1.0),
        noobj_conf=acc["to_noobj"] / jnp.maximum(acc["n_noobj"], 1.0),
        n_gt=jnp.sum(gt_valid.astype(jnp.float32)))


def detection_loss(raw, targets: jnp.ndarray, spec: NetworkSpec,
                   seen: jnp.ndarray) -> RegionLossMetrics:
    """Family dispatch: [region] specs -> region_loss on the single raw
    map; [yolo] specs -> yolo_loss over the tuple of per-scale maps.
    ``seen`` gates [region]'s early prior loss; [yolo] has none."""
    if spec.is_multi_head:
        return yolo_loss(raw, targets, spec)
    return region_loss(raw, targets, spec.region, seen)
