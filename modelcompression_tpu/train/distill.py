"""Knowledge-distillation fine-tune — the third recovery axis.

The reference's workflow recovers pruned accuracy with a plain fine-tune
(SURVEY.md §3.4, BASELINE.json:9). Distillation strengthens exactly that
step: the slimmed/quantized STUDENT trains against the original TEACHER's
raw detection map in addition to the ground-truth region loss, so the
student learns the teacher's soft box/objectness/class structure — the
standard compression companion to pruning (Hinton et al. 2015 soft
targets; objectness-gated detection form after Mehta & Ozturk 2018,
"Object detection at 200 FPS").

TPU-first shape: the teacher is BN-folded once at plan-build time and its
inference forward runs INSIDE the student's jitted train step on the same
augmented batch — one XLA program, no host round-trip, and the teacher
adds zero backward cost (its output enters the loss as data, so autodiff
never traverses it). Teacher params are threaded as runtime arguments
(never closure constants) so the 200 MB YOLOv2 teacher is not baked into
the executable.

Loss, on the raw (B, H, W, A*(5+C)) detection map — for multi-head
[yolo] specs (YOLOv3) the SAME map loss is summed over the per-scale
raw maps, matched scale-for-scale (``detection_distill_loss``; plan
validation requires both networks to share head count and per-scale
anchor pairs) — all terms summed / B to match ``region_loss``'s
normalization:

* objectness: MSE between teacher and student sigmoids, all cells — the
  teacher's "where is anything" map, including its near-zero background.
* coords: MSE on (sigma(tx), sigma(ty), tw, th), gated per-anchor by the
  TEACHER's objectness — background cells carry no box signal worth
  copying (the gating that replaces Mehta & Ozturk's FM-NMS).
* class: temperature-T KL(teacher || student) on the softmax classes
  (scaled by T^2, Hinton's convention), gated the same way; sigmoid-MSE
  when the cfg uses softmax=0.

Workflow::

    plan = make_distill_plan(teacher_params, teacher_spec, student_spec,
                             weight=1.0)
    step = make_train_step(student_spec, config, distill=plan)
    # or: train(state, spec, config, loader, n, distill=plan)

CLI surface: ``finetune --distill teacher.weights [--distill-cfg CFG]
[--distill-weight W] [--distill-temp T]`` — composes with ``--iterate``
(every round's slimmed student distills from the ORIGINAL teacher) and
with ``--qat``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from modelcompression_tpu.core.precision import Precision
from modelcompression_tpu.models.cfg import NetworkSpec, RegionLayer
from modelcompression_tpu.models.darknet import (
    Params, fold_batchnorm, forward_folded,
)


@dataclasses.dataclass(frozen=True)
class DistillPlan:
    """Static distillation plan for a fine-tune.

    ``teacher_params`` are BN-FOLDED (built by ``make_distill_plan``) —
    the teacher runs its cheap inference form. ``weight`` blends the
    distillation loss into the total (total = region + weight * distill).
    """

    teacher_params: Params
    teacher_spec: NetworkSpec
    weight: float = 1.0
    temp: float = 1.0
    coord_scale: float = 1.0
    obj_scale: float = 1.0
    class_scale: float = 1.0


def make_distill_plan(teacher_params: Params, teacher_spec: NetworkSpec,
                      student_spec: NetworkSpec, *,
                      weight: float = 1.0, temp: float = 1.0,
                      coord_scale: float = 1.0, obj_scale: float = 1.0,
                      class_scale: float = 1.0,
                      folded: bool = False) -> DistillPlan:
    """Validate teacher/student head compatibility and fold the teacher.

    The raw-map distillation loss compares anchors slot-for-slot, so the
    two networks must share the detection geometry: anchor count, class
    count, and the anchor shapes themselves (tw/th are offsets relative
    to the anchor priors — matching slot indices with different priors
    would distill the wrong boxes). Spatial grids are checked at trace
    time by shape.
    """
    if teacher_spec.is_multi_head != student_spec.is_multi_head:
        raise ValueError(
            "teacher and student must be the same head family — raw-map "
            "distillation compares maps scale-for-scale ([region] vs "
            "[yolo] cannot be slot-matched)")
    if teacher_spec.is_multi_head:
        th = [teacher_spec.layers[i] for i in teacher_spec.head_indices()]
        sh = [student_spec.layers[i] for i in student_spec.head_indices()]
        if len(th) != len(sh):
            raise ValueError(
                f"teacher has {len(th)} [yolo] heads, student {len(sh)} — "
                "multi-head distillation matches scales one-for-one")
        for k, (t, s) in enumerate(zip(th, sh)):
            if (t.n, t.classes) != (s.n, s.classes):
                raise ValueError(
                    f"[yolo] head {k}: teacher ({t.n} anchors, "
                    f"{t.classes} classes) does not match student "
                    f"({s.n}, {s.classes})")
            if t.anchor_pairs != s.anchor_pairs:
                raise ValueError(
                    f"[yolo] head {k}: teacher and student anchor priors "
                    "differ — tw/th are offsets relative to this scale's "
                    "priors, so slot-matching needs identical pairs")
    else:
        tr, sr = teacher_spec.region, student_spec.region
        if (tr.num, tr.classes) != (sr.num, sr.classes):
            raise ValueError(
                f"teacher head ({tr.num} anchors, {tr.classes} classes) "
                f"does not match student head ({sr.num}, {sr.classes})")
        if tuple(tr.anchors) != tuple(sr.anchors):
            raise ValueError(
                "teacher and student anchor priors differ — raw-map "
                "distillation compares tw/th per anchor slot, which is "
                "only meaningful for identical priors")
    if temp <= 0:
        raise ValueError(f"temperature must be > 0, got {temp}")
    if not folded:
        teacher_params = fold_batchnorm(teacher_params, teacher_spec)
    return DistillPlan(teacher_params=teacher_params,
                       teacher_spec=teacher_spec, weight=weight, temp=temp,
                       coord_scale=coord_scale, obj_scale=obj_scale,
                       class_scale=class_scale)


def teacher_forward(plan: DistillPlan, t_params: Params, x: jnp.ndarray,
                    precision: Precision) -> jnp.ndarray:
    """Teacher inference on the (already augmented) student batch.

    ``t_params`` is passed explicitly (not read from ``plan``) so the
    jitted caller can thread it as a runtime argument.
    """
    return forward_folded(t_params, x, plan.teacher_spec, precision)


def distill_loss(raw_s: jnp.ndarray, raw_t: jnp.ndarray,
                 region: RegionLayer, *, temp: float = 1.0,
                 coord_scale: float = 1.0, obj_scale: float = 1.0,
                 class_scale: float = 1.0) -> jnp.ndarray:
    """Objectness-gated distillation loss on raw [region] maps.

    Args:
      raw_s: student (B, H, W, A*(5+C)) raw output.
      raw_t: teacher map, same shape (stop-gradient applied here, so
        callers can pass it straight from the teacher forward).
    Returns a scalar, summed over cells / batch (``region_loss``'s
    normalization), exactly 0 when student == teacher.
    """
    return _distill_loss_map(raw_s, raw_t, region.num, region.classes,
                             bool(region.softmax), temp=temp,
                             coord_scale=coord_scale, obj_scale=obj_scale,
                             class_scale=class_scale)


def detection_distill_loss(raw_s, raw_t, spec: NetworkSpec, *,
                           temp: float = 1.0, coord_scale: float = 1.0,
                           obj_scale: float = 1.0,
                           class_scale: float = 1.0) -> jnp.ndarray:
    """Family dispatcher (mirrors ``train.detection_loss``): single-head
    [region] maps use ``distill_loss``; multi-head [yolo] specs sum the
    same objectness-gated map loss over the per-scale raw maps (class
    terms use the sigmoid-MSE branch — [yolo] classes are independent
    sigmoids, so there is no temperature softening to apply)."""
    if not spec.is_multi_head:
        return distill_loss(raw_s, raw_t, spec.region, temp=temp,
                            coord_scale=coord_scale, obj_scale=obj_scale,
                            class_scale=class_scale)
    heads = [spec.layers[i] for i in spec.head_indices()]
    assert len(raw_s) == len(raw_t) == len(heads)
    total = jnp.float32(0.0)
    for rs, rt, hl in zip(raw_s, raw_t, heads):
        total = total + _distill_loss_map(
            rs, rt, hl.n, hl.classes, False, temp=temp,
            coord_scale=coord_scale, obj_scale=obj_scale,
            class_scale=class_scale)
    return total


def _distill_loss_map(raw_s: jnp.ndarray, raw_t: jnp.ndarray,
                      a: int, c: int, softmax: bool, *, temp: float = 1.0,
                      coord_scale: float = 1.0, obj_scale: float = 1.0,
                      class_scale: float = 1.0) -> jnp.ndarray:
    """One raw map's loss: ``a`` anchors, ``c`` classes, softmax or
    multi-label-sigmoid class slots."""
    b, h, w, _ = raw_s.shape
    rs = raw_s.reshape(b, h, w, a, 5 + c).astype(jnp.float32)
    rt = jax.lax.stop_gradient(
        raw_t.reshape(b, h, w, a, 5 + c).astype(jnp.float32))

    xy_s, xy_t = jax.nn.sigmoid(rs[..., 0:2]), jax.nn.sigmoid(rt[..., 0:2])
    wh_s, wh_t = rs[..., 2:4], rt[..., 2:4]
    obj_s, obj_t = jax.nn.sigmoid(rs[..., 4]), jax.nn.sigmoid(rt[..., 4])

    gate = obj_t  # (B,H,W,A): teacher's belief there is an object
    coord = jnp.sum(gate * (jnp.sum((xy_s - xy_t) ** 2, axis=-1)
                            + jnp.sum((wh_s - wh_t) ** 2, axis=-1)))
    obj = jnp.sum((obj_s - obj_t) ** 2)

    if softmax:
        # KL(teacher || student) at temperature T, scaled by T^2 so the
        # soft-target gradient magnitude stays T-independent (Hinton)
        logp_s = jax.nn.log_softmax(rs[..., 5:] / temp, axis=-1)
        logp_t = jax.nn.log_softmax(rt[..., 5:] / temp, axis=-1)
        kl = jnp.sum(jnp.exp(logp_t) * (logp_t - logp_s), axis=-1)
        cls = (temp ** 2) * jnp.sum(gate * kl)
    else:
        ps, pt = jax.nn.sigmoid(rs[..., 5:]), jax.nn.sigmoid(rt[..., 5:])
        cls = jnp.sum(gate * jnp.sum((ps - pt) ** 2, axis=-1))

    total = coord_scale * coord + obj_scale * obj + class_scale * cls
    return total / b
