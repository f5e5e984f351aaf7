"""[yolo] multi-head loss tests (train/yolo_loss.py): head routing by
best global anchor, ignore-band objectness, per-class sigmoid BCE (not
softmax), duplicate resolution, gradient sanity, and the train-step
integration on the v3 fixture — the v3 counterpart of
tests/test_region_loss.py. Loss values follow the exact-gradient
convention (region_loss._bce_kl): KL-BCE on logistic outputs, half-SE on
linear tw/th."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from pytest import approx

from modelcompression_tpu.data.fixtures import tiny_region_cfg, tiny_yolo3_cfg
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.models.cfg import YoloLayer
from modelcompression_tpu.train.region_loss import region_loss
from modelcompression_tpu.train.yolo_loss import detection_loss, yolo_loss

SPEC = parse_cfg(tiny_yolo3_cfg(num_classes=3))  # 64x64 input
HEADS = [SPEC.layers[i] for i in SPEC.head_indices()]
C = 3
GRIDS = (8, 16)   # coarse (stride 8, mask 2,3), fine (stride 4, mask 0,1)
SEEN = jnp.asarray(100000)


def logit(p):
    return float(np.log(p / (1 - p)))


def raws_zero(b=1, obj_logit=0.0):
    out = []
    for g, l in zip(GRIDS, HEADS):
        r = np.zeros((b, g, g, l.n * (5 + C)), np.float32)
        r.reshape(b, g, g, l.n, 5 + C)[..., 4] = obj_logit
        out.append(jnp.asarray(r))
    return tuple(out)


def empty_targets(b=1, m=4):
    return jnp.zeros((b, m, 5), jnp.float32)


def best_global_anchor(w_norm, h_norm):
    """argmax shape-IoU over the shared pixel anchor list (net 64px)."""
    wp, hp = w_norm * 64, h_norm * 64
    anchors = np.asarray(HEADS[0].anchors).reshape(-1, 2)
    inter = np.minimum(anchors[:, 0], wp) * np.minimum(anchors[:, 1], hp)
    union = anchors[:, 0] * anchors[:, 1] + wp * hp - inter
    return int(np.argmax(inter / union))


def perfect_raws_for(cls_id, cx, cy, w, h):
    """Encode one GT into the correct head/cell/slot with obj ~1 and
    obj ~0 everywhere else (inverse of the decode, like the eval twin)."""
    raws = [np.asarray(r).copy().reshape(1, g, g, l.n, 5 + C)
            for r, g, l in zip(raws_zero(obj_logit=-20.0), GRIDS, HEADS)]
    for r in raws:  # class sigmoids are independent: pin them all ~0
        r[..., 5:] = -20.0
    ga = best_global_anchor(w, h)
    hi = next(k for k, l in enumerate(HEADS) if ga in l.mask)
    slot = HEADS[hi].mask.index(ga)
    g = GRIDS[hi]
    j, i = int(cx * g), int(cy * g)
    pw, ph = HEADS[hi].anchor_pairs[slot]
    r = raws[hi]
    r[0, i, j, slot, 0] = logit(np.clip(cx * g - j, 1e-3, 1 - 1e-3))
    r[0, i, j, slot, 1] = logit(np.clip(cy * g - i, 1e-3, 1 - 1e-3))
    r[0, i, j, slot, 2] = np.log(w * 64 / pw)
    r[0, i, j, slot, 3] = np.log(h * 64 / ph)
    r[0, i, j, slot, 4] = 20.0
    r[0, i, j, slot, 5 + cls_id] = 20.0
    return tuple(jnp.asarray(r.reshape(1, g, g, -1))
                 for r, g in zip(raws, GRIDS)), (hi, i, j, slot)


def test_no_gt_only_noobj():
    m = yolo_loss(raws_zero(), empty_targets(), SPEC)
    assert float(m.n_gt) == 0
    assert float(m.loss_coord) == 0
    assert float(m.loss_obj) == 0
    assert float(m.loss_cls) == 0
    # zero logits everywhere, no GT -> every predictor in the noobj band
    # at KL(0 || sigmoid(0)) = log 2: (8*8*2 + 16*16*2) * log(2)
    assert float(m.loss_noobj) == approx(640 * np.log(2), rel=1e-5)
    assert float(m.loss) == approx(float(m.loss_noobj), rel=1e-5)


def test_perfect_prediction_near_zero_loss():
    gt = jnp.asarray([[[1.0, 0.55, 0.55, 0.7, 0.7]]])  # big -> coarse head
    raws, _ = perfect_raws_for(1, 0.55, 0.55, 0.7, 0.7)
    m = yolo_loss(raws, gt, SPEC)
    assert float(m.n_gt) == 1
    assert float(m.avg_iou) > 0.99
    assert float(m.recall50) == 1.0
    assert float(m.loss_coord) < 1e-4
    assert float(m.loss_cls) < 1e-6
    assert float(m.loss_obj) < 1e-6  # KL(1 || sigmoid(20)) = softplus(-20)
    assert float(m.obj_conf) > 0.99
    assert float(m.noobj_conf) < 0.01
    assert float(m.loss) < 0.05


@pytest.mark.parametrize("w,h,want_head", [(0.7, 0.7, 0), (0.1, 0.1, 1)])
def test_assignment_routes_to_best_anchor_head(w, h, want_head):
    """A GT trains ONLY the head whose mask holds its best global anchor:
    the coord gradient is nonzero at exactly one (head, cell, slot)."""
    gt = jnp.asarray([[[2.0, 0.3, 0.55, w, h]]])

    def coord(raws):
        return yolo_loss(raws, gt, SPEC).loss_coord

    grads = jax.grad(coord)(raws_zero())
    ga = best_global_anchor(w, h)
    assert ga in HEADS[want_head].mask
    for k, (g, l) in enumerate(zip(GRIDS, HEADS)):
        gk = np.asarray(grads[k]).reshape(g, g, l.n, 5 + C)
        nz = sorted(set(zip(*np.nonzero(np.abs(gk).sum(-1)))))
        if k == want_head:
            assert nz == [(int(0.55 * g), int(0.3 * g),
                           l.mask.index(ga))]
        else:
            assert nz == []


def test_ignore_band_spares_overlapping_predictors():
    """Predictors whose best-GT IoU exceeds ignore_thresh get no noobj
    loss even when unassigned: noobj drops when a GT appears."""
    gt = jnp.asarray([[[0.0, 0.5 + 1e-4, 0.5 + 1e-4, 0.6, 0.6]]])
    m0 = yolo_loss(raws_zero(), empty_targets(), SPEC)
    m1 = yolo_loss(raws_zero(), gt, SPEC)
    assert float(m1.loss_noobj) < float(m0.loss_noobj)


def test_class_loss_is_per_class_sigmoid_not_softmax():
    """At zero logits every class BCE is log 2 INDEPENDENTLY per class:
    one assigned GT costs C*log(2) — a softmax CE would cost log(C)
    (0.693*3 = 2.08 vs 1.10 for C=3, so the forms are distinguishable)."""
    gt = jnp.asarray([[[2.0, 0.55, 0.55, 0.7, 0.7]]])
    m = yolo_loss(raws_zero(), gt, SPEC)
    assert float(m.loss_cls) == approx(C * np.log(2), rel=1e-5)
    # objectness target is 1 (no rescore option in v3): KL(1||0.5)=log 2
    assert float(m.loss_obj) == approx(np.log(2), rel=1e-5)


def test_coord_scale_is_2_minus_wh():
    """The coord term carries Darknet's (2 - gw*gh) size compensation."""
    g = GRIDS[0]
    # same cell fraction/anchor for both, different sizes
    for w in (0.7, 0.4):
        gt = jnp.asarray([[[0.0, 0.5 / g * (g // 2 * 2 + 1), 0.5, w, w]]])
        raws = raws_zero()
        m = yolo_loss(raws, gt, SPEC)
        ga = best_global_anchor(w, w)
        hi = next(k for k, l in enumerate(HEADS) if ga in l.mask)
        pw, _ = HEADS[hi].anchor_pairs[HEADS[hi].mask.index(ga)]
        gg = GRIDS[hi]
        fx = float(gt[0, 0, 1] * gg - int(gt[0, 0, 1] * gg))
        fy = float(0.5 * gg - int(0.5 * gg))
        tw = np.log(w * 64 / pw)

        def kl_at_zero_logit(t):  # KL(t || sigmoid(0)) = log2 - H(t)
            ent = 0.0 if t in (0.0, 1.0) else (
                -t * np.log(t) - (1 - t) * np.log(1 - t))
            return np.log(2) - ent

        want = (2 - w * w) * (kl_at_zero_logit(fx) + kl_at_zero_logit(fy)
                              + tw ** 2)  # 0.5 * 2 * tw^2
        assert float(m.loss_coord) == approx(float(want), rel=1e-4)


def test_duplicate_cell_anchor_later_wins():
    """Two GTs claiming the same (head, cell, slot): only the later row
    scatters (class gradient shows the later class)."""
    gt = jnp.asarray([[[0.0, 0.52, 0.52, 0.7, 0.7],
                       [1.0, 0.53, 0.53, 0.72, 0.72]]])

    def cls_loss(raws):
        return yolo_loss(raws, gt, SPEC).loss_cls

    grads = jax.grad(cls_loss)(raws_zero())
    ga = best_global_anchor(0.7, 0.7)
    hi = next(k for k, l in enumerate(HEADS) if ga in l.mask)
    g, l = GRIDS[hi], HEADS[hi]
    gk = np.asarray(grads[hi]).reshape(g, g, l.n, 5 + C)
    i = j = int(0.52 * g)
    slot = l.mask.index(ga)
    cls_g = gk[i, j, slot, 5:]
    # true class (later row = 1) pushes up, others push down
    assert cls_g[1] < 0 and cls_g[0] > 0 and cls_g[2] > 0


def test_loss_differentiable_and_finite():
    rng = np.random.default_rng(0)
    raws = tuple(jnp.asarray(rng.standard_normal(
        (2, g, g, l.n * (5 + C))).astype(np.float32))
        for g, l in zip(GRIDS, HEADS))
    gt = jnp.asarray(rng.uniform(0.2, 0.6, (2, 6, 5)).astype(np.float32))

    def total(rs):
        return yolo_loss(rs, gt, SPEC).loss

    val, grads = jax.value_and_grad(total)(raws)
    assert np.isfinite(float(val))
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()


def test_truth_thresh_below_one_rejected():
    import dataclasses
    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    hi = spec.head_indices()[0]
    spec.layers[hi] = dataclasses.replace(spec.layers[hi], truth_thresh=0.5)
    with pytest.raises(ValueError, match="truth_thresh"):
        yolo_loss(raws_zero(), empty_targets(), spec)


def test_mismatched_head_count_rejected():
    with pytest.raises(ValueError, match="raw maps"):
        yolo_loss(raws_zero()[:1], empty_targets(), SPEC)


def test_detection_loss_dispatch():
    """detection_loss routes [region] specs to region_loss (identical
    metrics) and [yolo] specs to yolo_loss."""
    rspec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    region = rspec.region
    a, c = region.num, region.classes
    raw = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 4, 4, a * (5 + c))).astype(np.float32))
    gt = jnp.asarray([[[1.0, 0.5, 0.5, 0.3, 0.3]]])
    m_d = detection_loss(raw, gt, rspec, SEEN)
    m_r = region_loss(raw, gt, region, SEEN)
    assert float(m_d.loss) == float(m_r.loss)
    m_v3 = detection_loss(raws_zero(), gt, SPEC, SEEN)
    assert np.isfinite(float(m_v3.loss))


# ------------------------------------------------------ train integration


def test_v3_train_step_runs_and_learns():
    """make_train_step on the v3 fixture: one jitted program through
    shortcut/upsample/multi-head forward + yolo loss + backward; a short
    overfit on one fixed batch must reduce the loss."""
    from modelcompression_tpu.train import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )

    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(0))
    config = TrainConfig.from_spec(spec, learning_rate=1e-3,
                                   augment_flip=False)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(1))
    step = make_train_step(spec, config, tx)

    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.integers(0, 255, (4, 64, 64, 3),
                                      dtype=np.uint8))
    targets = jnp.asarray(
        np.tile(np.asarray([[1.0, 0.5, 0.5, 0.6, 0.6],
                            [0.0, 0.25, 0.25, 0.12, 0.12]],
                           np.float32), (4, 1, 1)))
    losses = []
    for _ in range(12):
        state, metrics = step(state, images, targets)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses
    assert int(state["step"]) == 12
    assert int(state["seen"]) == 48
