"""Fixed-shape on-device NMS (SURVEY.md §7.4.2).

XLA needs static shapes, so instead of the reference's dynamic-length greedy
NMS (host numpy O(n^2), SURVEY.md §3.1 hot loop), we run K greedy selection
steps over the full padded candidate set with masking:

  step i: pick argmax of live scores -> emit (or emit invalid if score==0)
          -> zero every live box with IoU > thresh against the pick.

This serial form is exactly greedy NMS on the non-padded set (oracle-tested
against a numpy implementation) but measured ~7.4 ms of a 14 ms batch-64
pruned-YOLOv2 step on a v5 lite — longer than the entire pruned conv stack,
because its 100-round argmax chain does not shrink with the model. It is
kept as ``nms_padded`` for the oracle tests and exact-over-all-candidates
use.

The production path (``nms_topk``, used by ``per_class_nms``) restructures
the same greedy algorithm TPU-first: prefilter to the top-K scoring
candidates with ``lax.top_k`` (sorted, ties broken by lower index — the
same order greedy argmax visits them), compute ONE (K, K) pairwise-IoU
matrix in parallel on the VPU, then resolve suppression with a K-step
``lax.scan`` whose body is a single (K,) boolean mask — the serial chain
only carries tiny vector ops while all IoU math runs wide.

Semantics: ``nms_topk`` equals classic greedy NMS whenever at most K
candidates exceed ``score_thresh`` (tested); above that it is greedy NMS
over the top-K scoring candidates — the ones greedy would visit first.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def iou_corners(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (4,) box against (N, 4) boxes; corner format."""
    x1 = jnp.maximum(box[0], boxes[:, 0])
    y1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[2], boxes[:, 2])
    y2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    area = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
    areas = (jnp.maximum(boxes[:, 2] - boxes[:, 0], 0)
             * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0))
    union = area + areas - inter
    return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("max_out", "diou", "diou_beta"))
def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray,
               iou_thresh: float = 0.45, score_thresh: float = 0.0,
               max_out: int = 100, diou: bool = False,
               diou_beta: float = 1.0
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static output size.

    Args:
      boxes: (N, 4) corner format.
      scores: (N,) — entries <= score_thresh are treated as absent.
      max_out: K, number of selection steps / output slots.
      diou: DIoU-NMS (Zheng et al. 2020): suppress on
        ``IoU - rho^2/c^2 > iou_thresh`` — the center-distance penalty
        spares far-apart boxes of the same overlap, helping occluded
        same-class objects. Same greedy structure, different criterion.

    Returns:
      sel_boxes: (K, 4); sel_scores: (K,) (0 where invalid);
      valid: (K,) bool.
    """
    n = boxes.shape[0]
    live = jnp.where(scores > score_thresh, scores, 0.0)

    def step(i, state):
        live, out_idx, out_scores = state
        j = jnp.argmax(live)
        s = live[j]
        keep = s > 0
        out_idx = out_idx.at[i].set(jnp.where(keep, j, -1))
        out_scores = out_scores.at[i].set(jnp.where(keep, s, 0.0))
        iou = iou_corners(boxes[j], boxes)
        if diou:
            iou = iou - diou_penalty(boxes[j], boxes, diou_beta)
        suppress = (iou > iou_thresh) & keep
        live = jnp.where(suppress, 0.0, live)
        live = live.at[j].set(0.0)
        return live, out_idx, out_scores

    _, idx, out_scores = jax.lax.fori_loop(
        0, max_out, step,
        (live, jnp.full((max_out,), -1, jnp.int32),
         jnp.zeros((max_out,), scores.dtype)))
    sel_boxes = boxes[jnp.maximum(idx, 0)]
    valid = idx >= 0
    sel_boxes = jnp.where(valid[:, None], sel_boxes, 0.0)
    return sel_boxes, out_scores, valid


def diou_penalty(box: jnp.ndarray, boxes: jnp.ndarray,
                 beta: float = 1.0) -> jnp.ndarray:
    """DIoU center-distance penalty (rho^2/c^2)^beta (Zheng et al. 2020;
    darknet's diounms beta_nms exponent) of one (4,) corner box against
    (N, 4): squared center distance over the squared diagonal of the
    smallest enclosing box. beta=1 is the paper form."""
    cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
    cxs = (boxes[:, 0] + boxes[:, 2]) / 2
    cys = (boxes[:, 1] + boxes[:, 3]) / 2
    rho2 = (cx - cxs) ** 2 + (cy - cys) ** 2
    ex1 = jnp.minimum(box[0], boxes[:, 0])
    ey1 = jnp.minimum(box[1], boxes[:, 1])
    ex2 = jnp.maximum(box[2], boxes[:, 2])
    ey2 = jnp.maximum(box[3], boxes[:, 3])
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    pen = jnp.where(c2 > 0, rho2 / c2, 0.0)
    return pen if beta == 1.0 else pen ** beta


def pairwise_diou_penalty(a: jnp.ndarray, b: jnp.ndarray,
                          beta: float = 1.0) -> jnp.ndarray:
    """DIoU penalty of (N, 4) against (M, 4) -> (N, M), all-parallel."""
    acx, acy = (a[:, 0] + a[:, 2]) / 2, (a[:, 1] + a[:, 3]) / 2
    bcx, bcy = (b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2
    rho2 = ((acx[:, None] - bcx[None, :]) ** 2
            + (acy[:, None] - bcy[None, :]) ** 2)
    ex1 = jnp.minimum(a[:, None, 0], b[None, :, 0])
    ey1 = jnp.minimum(a[:, None, 1], b[None, :, 1])
    ex2 = jnp.maximum(a[:, None, 2], b[None, :, 2])
    ey2 = jnp.maximum(a[:, None, 3], b[None, :, 3])
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    pen = jnp.where(c2 > 0, rho2 / c2, 0.0)
    return pen if beta == 1.0 else pen ** beta


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of (N, 4) against (M, 4) corner boxes -> (N, M), all-parallel."""
    x1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    area_a = (jnp.maximum(a[:, 2] - a[:, 0], 0)
              * jnp.maximum(a[:, 3] - a[:, 1], 0))
    area_b = (jnp.maximum(b[:, 2] - b[:, 0], 0)
              * jnp.maximum(b[:, 3] - b[:, 1], 0))
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("max_out", "exact_prefilter", "diou",
                                    "diou_beta"))
def nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_thresh: float = 0.45, score_thresh: float = 0.0,
             max_out: int = 100, exact_prefilter: bool = True,
             diou: bool = False, diou_beta: float = 1.0
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over the top-``max_out`` scoring candidates (module
    docstring). Output order is score-descending.

    Args:
      boxes: (N, 4) corner format.
      scores: (N,) — entries <= score_thresh are treated as absent.
      max_out: K, prefilter size == number of output slots.
      exact_prefilter: True (default) -> ``lax.top_k`` (exact sort; the
        oracle/bit-match path). False -> ``lax.approx_max_k`` to 4K
        candidates at recall_target 0.99, then an exact top-K among
        them. NOTE: at the production shape (B=64, N=845, C=20, K=32,
        vmapped) the approx path MEASURED SLOWER than the exact sort
        (1.21 vs 0.74 ms; docs/PERF.md "Explored and rejected") — it is
        kept for shape regimes where N >> K makes the sort dominant.
        Candidate sets can differ from exact greedy only when two
        true-top-K scores collide in one reduction bin (recall 1.0000
        measured on detector-like score distributions); on CPU
        approx_max_k lowers to the exact sort.

    Returns:
      sel_boxes: (K, 4); sel_scores: (K,) (0 where invalid);
      valid: (K,) bool.
    """
    n = boxes.shape[0]
    k = min(max_out, n)
    s = jnp.where(scores > score_thresh, scores, 0.0)
    if exact_prefilter or n <= 4 * k:
        vals, idx = jax.lax.top_k(s, k)      # sorted desc, stable ties
    else:
        kk = min(max(4 * k, 128), n)
        vals0, idx0 = jax.lax.approx_max_k(s, kk, recall_target=0.99)
        vals, sub = jax.lax.top_k(vals0, k)  # exact order among survivors
        idx = jnp.take(idx0, sub, axis=-1)
    cand = boxes[idx]                        # (K, 4)
    crit = pairwise_iou(cand, cand)          # (K, K)
    if diou:  # DIoU-NMS (Zheng et al. 2020): still a STATIC pairwise
        # criterion, so the one-shot suppression scan applies unchanged
        crit = crit - pairwise_diou_penalty(cand, cand, diou_beta)
    suppress = crit > iou_thresh
    js = jnp.arange(k)

    def body(live, row):
        sup_i, i = row
        keep_i = live[i]
        live = live & ~(sup_i & keep_i & (js > i))
        return live, keep_i

    _, keep = jax.lax.scan(body, vals > 0, (suppress, js))
    valid = keep & (vals > 0)
    out_scores = jnp.where(valid, vals, 0.0)
    out_boxes = jnp.where(valid[:, None], cand, 0.0)
    if k < max_out:  # pad output slots to the requested static size
        pad = max_out - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return out_boxes, out_scores, valid


def per_class_nms(boxes: jnp.ndarray, class_scores: jnp.ndarray,
                  iou_thresh: float = 0.45, score_thresh: float = 1e-3,
                  max_out: int = 100, exact_prefilter: bool = True,
                  diou: bool = False, diou_beta: float = 1.0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS independently per class (top-k production path).

    Args:
      boxes: (N, 4); class_scores: (N, C) (e.g. objectness * class prob).

    Returns:
      (C, K, 4) boxes, (C, K) scores, (C, K) valid.
    """
    f = jax.vmap(
        lambda s: nms_topk(boxes, s, iou_thresh, score_thresh, max_out,
                           exact_prefilter, diou, diou_beta),
        in_axes=1)
    return f(class_scores)


def batched_per_class_nms(boxes: jnp.ndarray, class_scores: jnp.ndarray,
                          iou_thresh: float = 0.45,
                          score_thresh: float = 1e-3,
                          max_out: int = 100, exact_prefilter: bool = True,
                          diou: bool = False, diou_beta: float = 1.0):
    """vmap over the batch dim: (B,N,4), (B,N,C) -> (B,C,K,...)."""
    f = jax.vmap(lambda b, s: per_class_nms(
        b, s, iou_thresh, score_thresh, max_out, exact_prefilter, diou,
        diou_beta))
    return f(boxes, class_scores)


def per_class_nms_prefiltered(boxes: jnp.ndarray, class_scores: jnp.ndarray,
                              iou_thresh: float = 0.45,
                              score_thresh: float = 1e-3,
                              max_out: int = 100, prefilter: int = 256,
                              exact_prefilter: bool = True,
                              diou: bool = False, diou_beta: float = 1.0
                              ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]:
    """Per-class NMS behind a CLASS-AGNOSTIC candidate prefilter
    (VERDICT r1 #8): one top-``prefilter`` selection on the per-candidate
    MAX class score cuts N before the C per-class sorts, so the per-class
    work runs on N'=``prefilter`` candidates instead of N.

    EXACTNESS CONDITION: identical to ``per_class_nms`` whenever at most
    ``prefilter`` candidates have ANY class score above ``score_thresh``
    (then every candidate relevant to every class survives the gather;
    sub-threshold scores are zeroed either way). Beyond that it keeps the
    ``prefilter`` best candidates by max-class score — the same
    graceful-truncation shape as ``nms_topk`` itself, and the eval
    pipeline's overflow counter (pipeline.py) makes the regime
    observable. Candidates tied in a CLASS score may order differently
    than unfiltered (the gather reorders by max score); real detector
    scores are continuous so ties are measure-zero.

    Args:
      boxes: (N, 4); class_scores: (N, C).
    Returns: (C, K, 4), (C, K), (C, K).
    """
    n = boxes.shape[0]
    np_ = min(prefilter, n)
    m = jnp.max(class_scores, axis=-1)                       # (N,)
    m = jnp.where(m > score_thresh, m, 0.0)
    vals, idx = jax.lax.top_k(m, np_)                        # (N',)
    b2 = boxes[idx]                                          # (N', 4)
    cs2 = jnp.where(vals[:, None] > 0, class_scores[idx], 0.0)
    return per_class_nms(b2, cs2, iou_thresh, score_thresh, max_out,
                         exact_prefilter, diou, diou_beta)


def batched_bisect_prefilter(boxes: jnp.ndarray, class_scores: jnp.ndarray,
                             score_thresh: float, prefilter: int
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The class-agnostic candidate prefilter as a BATCHED SEGMENTED
    BISECTION instead of a sort (VERDICT r3 #1): select the top-
    ``prefilter`` candidates per image by max class score using the same
    bit-bisection machinery the weight masks use (ops/topk_mask
    .segmented_rank_mask, one segment per image), then compact the
    survivors into fixed (B, N') slots with a cumsum-position scatter.
    O(N) elementwise passes instead of the O(N log N) per-image sort the
    ``lax.top_k`` prefilter lowers to on TPU (the trace's ``sort`` op).

    SET-equivalent to the top_k prefilter in the exactness regime (at
    most N' candidates above ``score_thresh`` — then both keep every
    live candidate). In the overflow regime the kept SET can differ only
    on score ties at the N'-th value (the bisection's stable rank keeps
    the highest concat-index ties, lax.top_k keeps the lowest) — both
    are approximations there, and the eval pipeline's n_any counter
    makes the regime observable. Survivors are emitted in CANDIDATE-
    INDEX order, not score order; the per-class NMS re-sorts by class
    score, so downstream results are unaffected.

    Returns (b2, cs2): (B, N', 4) boxes and (B, N', C) class scores
    (zeroed where the slot's max score is not above threshold).
    """
    from modelcompression_tpu.ops.topk_mask import (
        abs_bits, segmented_rank_mask,
    )
    bb, n, _ = class_scores.shape
    np_ = min(prefilter, n)
    m = jnp.max(class_scores, axis=-1)                       # (B, N)
    m = jnp.where(m > score_thresh, m, 0.0)
    bits = abs_bits(m).reshape(-1)
    seg = jnp.repeat(jnp.arange(bb, dtype=jnp.int32), n)
    n_zero = jnp.full((bb,), n - np_, jnp.int32)
    keep = segmented_rank_mask(bits, seg, n_zero, bb).reshape(bb, n)
    # compact survivors into exactly N' slots per row: kept elements go
    # to their cumsum position, dropped ones aim out of bounds (mode=
    # 'drop'). Exactly N' are kept per row by construction (zeros
    # included when fewer than N' candidates are live — their class
    # scores are zeroed below, same as the top_k path's zero-val rows).
    pos = jnp.where(keep, jnp.cumsum(keep, axis=1) - 1, np_)
    rows = jnp.broadcast_to(jnp.arange(bb)[:, None], (bb, n))
    cols = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], (bb, n))
    idx = jnp.zeros((bb, np_), jnp.int32).at[rows, pos].set(
        cols, mode="drop")
    vals = jnp.take_along_axis(m, idx, axis=1)               # (B, N')
    b2 = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    cs2 = jnp.where(vals[..., None] > 0,
                    jnp.take_along_axis(class_scores, idx[..., None],
                                        axis=1), 0.0)
    return b2, cs2


def batched_per_class_nms_prefiltered(boxes: jnp.ndarray,
                                      class_scores: jnp.ndarray,
                                      iou_thresh: float = 0.45,
                                      score_thresh: float = 1e-3,
                                      max_out: int = 100,
                                      prefilter: int = 256,
                                      exact_prefilter: bool = True,
                                      diou: bool = False,
                                      diou_beta: float = 1.0,
                                      impl: str = "topk"):
    """vmap over the batch dim: (B,N,4), (B,N,C) -> (B,C,K,...).

    ``impl``: 'topk' (default — per-image ``lax.top_k`` sort) or
    'bisect' (``batched_bisect_prefilter`` — the sort-free segmented
    bisection; same exactness condition, see its docstring)."""
    if impl == "bisect":
        b2, cs2 = batched_bisect_prefilter(boxes, class_scores,
                                           score_thresh, prefilter)
        f = jax.vmap(lambda b, s: per_class_nms(
            b, s, iou_thresh, score_thresh, max_out, exact_prefilter,
            diou, diou_beta))
        return f(b2, cs2)
    if impl != "topk":
        raise ValueError(f"impl must be 'topk' or 'bisect', got {impl!r}")
    f = jax.vmap(lambda b, s: per_class_nms_prefiltered(
        b, s, iou_thresh, score_thresh, max_out, prefilter,
        exact_prefilter, diou, diou_beta))
    return f(boxes, class_scores)


@functools.partial(jax.jit,
                   static_argnames=("max_out", "linear"))
def soft_nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray,
                  iou_thresh: float = 0.3, score_thresh: float = 1e-3,
                  max_out: int = 100, sigma: float = 0.5,
                  linear: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (Bodla et al. 2017) over the top-``max_out`` scoring
    candidates: instead of erasing overlapping boxes, each selection
    DECAYS the remaining scores — Gaussian ``s *= exp(-iou^2 / sigma)``
    (default) or linear ``s *= 1 - iou`` where ``iou > iou_thresh``.
    Boxes are emitted in decayed-score order; a box whose decayed score
    falls to ``score_thresh`` or below is dropped.

    TPU-first shape, same as ``nms_topk``: one exact ``lax.top_k``
    prefilter, ONE (K, K) pairwise-IoU matrix computed wide on the VPU,
    then a K-step ``fori_loop`` whose body is argmax + one (K,) decay
    multiply — the serial chain carries only tiny vector ops. (The
    one-shot suppression scan of ``nms_topk`` cannot apply here: decayed
    scores change the visit order, so soft-NMS is inherently K serial
    argmax rounds.)

    EXACTNESS CONDITION vs the full-N host algorithm: identical whenever
    at most K candidates exceed ``score_thresh`` (decay only lowers
    scores, so candidates the prefilter drops could never be emitted);
    beyond that it runs on the K best by ORIGINAL score — the same
    graceful-truncation shape as ``nms_topk``, observable through the
    eval pipeline's n_cand counter.

    Args:
      boxes: (N, 4) corner format.
      scores: (N,) — entries <= score_thresh are treated as absent.
      max_out: K, prefilter size == output slots == decay rounds.
      sigma: Gaussian decay temperature (ignored when ``linear``).
      linear: use the linear decay weight instead of Gaussian.

    Returns:
      sel_boxes: (K, 4) (0 where invalid); sel_scores: (K,) DECAYED
      scores, descending (0 where invalid); valid: (K,) bool.
    """
    n = boxes.shape[0]
    k = min(max_out, n)
    s = jnp.where(scores > score_thresh, scores, 0.0)
    vals, idx = jax.lax.top_k(s, k)          # sorted desc, stable ties
    cand = boxes[idx]                        # (K, 4)
    iou = pairwise_iou(cand, cand)           # (K, K), once, all-parallel
    if linear:
        w = jnp.where(iou > iou_thresh, 1.0 - iou, 1.0)
    else:
        w = jnp.exp(-(iou * iou) / sigma)
    eye = jnp.arange(k)

    def step(i, state):
        live, out_idx, out_scores = state
        j = jnp.argmax(live)
        sj = live[j]
        keep = sj > score_thresh
        out_idx = out_idx.at[i].set(jnp.where(keep, j, -1))
        out_scores = out_scores.at[i].set(jnp.where(keep, sj, 0.0))
        # decay survivors by the pick's weight row; retire the pick.
        # Once every live score is <= score_thresh nothing more is
        # emitted (keep stays False) — decay is monotone decreasing.
        decay = jnp.where(eye == j, 0.0, w[j])
        live = jnp.where(keep, live * decay, live)
        return live, out_idx, out_scores

    _, oidx, oscores = jax.lax.fori_loop(
        0, k, step,
        (vals, jnp.full((k,), -1, jnp.int32), jnp.zeros((k,), vals.dtype)))
    valid = oidx >= 0
    out_boxes = jnp.where(valid[:, None], cand[jnp.maximum(oidx, 0)], 0.0)
    if k < max_out:  # pad output slots to the requested static size
        pad = max_out - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        oscores = jnp.pad(oscores, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return out_boxes, oscores, valid


def per_class_soft_nms(boxes: jnp.ndarray, class_scores: jnp.ndarray,
                       iou_thresh: float = 0.3, score_thresh: float = 1e-3,
                       max_out: int = 100, sigma: float = 0.5,
                       linear: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS independently per class: (N,4), (N,C) -> (C,K,...)."""
    f = jax.vmap(
        lambda s: soft_nms_topk(boxes, s, iou_thresh, score_thresh,
                                max_out, sigma, linear),
        in_axes=1)
    return f(class_scores)


def batched_per_class_soft_nms(boxes: jnp.ndarray,
                               class_scores: jnp.ndarray,
                               iou_thresh: float = 0.3,
                               score_thresh: float = 1e-3,
                               max_out: int = 100, sigma: float = 0.5,
                               linear: bool = False):
    """vmap over the batch dim: (B,N,4), (B,N,C) -> (B,C,K,...)."""
    f = jax.vmap(lambda b, s: per_class_soft_nms(
        b, s, iou_thresh, score_thresh, max_out, sigma, linear))
    return f(boxes, class_scores)


def per_class_nms_padded(boxes: jnp.ndarray, class_scores: jnp.ndarray,
                         iou_thresh: float = 0.45,
                         score_thresh: float = 1e-3, max_out: int = 100,
                         diou: bool = False, diou_beta: float = 1.0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EXACT greedy NMS per class over ALL N candidates (``nms_padded``),
    no top-K candidate prefilter: correct even when more than ``max_out``
    candidates clear ``score_thresh`` — the serial-argmax cost the
    prefilter path avoids (module docstring) is paid deliberately here.
    Only the OUTPUT is capped at ``max_out`` surviving detections per
    class. (C, K, 4), (C, K), (C, K)."""
    f = jax.vmap(
        lambda s: nms_padded(boxes, s, iou_thresh, score_thresh, max_out,
                             diou, diou_beta),
        in_axes=1)
    return f(class_scores)


def batched_per_class_nms_padded(boxes: jnp.ndarray,
                                 class_scores: jnp.ndarray,
                                 iou_thresh: float = 0.45,
                                 score_thresh: float = 1e-3,
                                 max_out: int = 100,
                                 diou: bool = False, diou_beta: float = 1.0):
    """vmap over the batch dim: (B,N,4), (B,N,C) -> (B,C,K,...)."""
    f = jax.vmap(lambda b, s: per_class_nms_padded(
        b, s, iou_thresh, score_thresh, max_out, diou, diou_beta))
    return f(boxes, class_scores)
