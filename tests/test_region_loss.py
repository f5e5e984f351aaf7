"""Region loss tests (SURVEY.md §4.1/A.3): assignment correctness on
hand-built grids, loss-component behavior, prior-loss gating, gradient
sanity."""

import jax
import jax.numpy as jnp
import numpy as np
from pytest import approx

from modelcompression_tpu.models.cfg import RegionLayer
from modelcompression_tpu.train.region_loss import (
    PRIOR_SEEN_CUTOFF, region_loss,
)

REGION = RegionLayer(anchors=(1.0, 1.0, 3.0, 3.0), classes=4, num=2,
                     thresh=0.6, rescore=True, object_scale=5.0,
                     noobject_scale=1.0, class_scale=1.0, coord_scale=1.0)
A, C = 2, 4
H = W = 4
SEEN = jnp.asarray(PRIOR_SEEN_CUTOFF + 1)  # prior loss off


def logit(p):
    return float(np.log(p / (1 - p)))


def empty_targets(b=1, m=5):
    return jnp.zeros((b, m, 5), jnp.float32)


def raw_zeros(b=1):
    return jnp.zeros((b, H, W, A * (5 + C)), jnp.float32)


def perfect_raw_for(cls_id, cx, cy, w, h):
    """Raw map predicting exactly one GT box with obj=~1 at the right
    cell/anchor, obj ~0 elsewhere."""
    raw = np.zeros((1, H, W, A, 5 + C), np.float32)
    raw[..., 4] = -20.0
    j, i = int(cx * W), int(cy * H)
    anchors = np.asarray(REGION.anchor_pairs)
    # best shape anchor
    ai = int(np.argmin([abs(np.log(w * W / pw)) + abs(np.log(h * H / ph))
                        for pw, ph in anchors]))
    raw[0, i, j, ai, 0] = logit(np.clip(cx * W - j, 1e-3, 1 - 1e-3))
    raw[0, i, j, ai, 1] = logit(np.clip(cy * H - i, 1e-3, 1 - 1e-3))
    raw[0, i, j, ai, 2] = np.log(w * W / anchors[ai, 0])
    raw[0, i, j, ai, 3] = np.log(h * H / anchors[ai, 1])
    raw[0, i, j, ai, 4] = 20.0
    raw[0, i, j, ai, 5 + cls_id] = 20.0
    return jnp.asarray(raw.reshape(1, H, W, A * (5 + C)))


def test_no_gt_only_noobj():
    m = region_loss(raw_zeros(), empty_targets(), REGION, SEEN)
    assert float(m.n_gt) == 0
    assert float(m.loss_coord) == 0
    assert float(m.loss_obj) == 0
    assert float(m.loss_cls) == 0
    # zero logits everywhere: noobj = 1.0 * sum(KL(0||sigmoid(0))) per slot
    assert float(m.loss_noobj) == approx(H * W * A * np.log(2), rel=1e-5)
    assert float(m.loss) == approx(float(m.loss_noobj), rel=1e-5)


def test_perfect_prediction_near_zero_loss():
    gt = jnp.asarray([[[2.0, 0.6, 0.6, 0.25, 0.25]]])  # cls 2
    raw = perfect_raw_for(2, 0.6, 0.6, 0.25, 0.25)
    m = region_loss(raw, gt, REGION, SEEN)
    assert float(m.avg_iou) > 0.99
    assert float(m.recall50) == 1.0
    assert float(m.loss_coord) < 1e-4
    assert float(m.loss_cls) < 1e-6
    # rescore: KL(iou || sigmoid(20)) * 5 — iou is ~1 up to float error,
    # and the KL of a 1-eps target vs an overconfident sigmoid(20) is
    # O(eps * 14), so small but not MSE-tiny
    assert float(m.loss_obj) < 0.05
    assert float(m.obj_conf) > 0.99
    assert float(m.noobj_conf) < 0.01
    assert float(m.loss) < 0.1


def test_assignment_cell_and_anchor():
    """GT sized like anchor 1 must be assigned to anchor 1 in its cell:
    gradient w.r.t. raw is nonzero exactly there for coord channels."""
    gt = jnp.asarray([[[1.0, 0.55, 0.3, 3.0 / W, 3.0 / H]]])  # anchor1 shape

    def coord_loss(raw):
        return region_loss(raw, gt, REGION, SEEN).loss_coord

    g = jax.grad(coord_loss)(raw_zeros())
    g = np.asarray(g).reshape(H, W, A, 5 + C)
    j, i = int(0.55 * W), int(0.3 * H)
    nz = np.nonzero(np.abs(g).sum(-1))
    assert list(zip(*nz)) == [(i, j, 1)]


def test_noobj_excludes_high_iou_anchors():
    """Anchors overlapping a GT above thresh get no noobj loss even if
    unassigned."""
    gt = jnp.asarray([[[0.0, 0.5 + 1e-4, 0.5 + 1e-4, 0.5, 0.5]]])
    # centered box the size of 2x2 cells: both anchors at the center cell
    # overlap it substantially
    m0 = region_loss(raw_zeros(), empty_targets(), REGION, SEEN)
    m1 = region_loss(raw_zeros(), gt, REGION, SEEN)
    # with a GT present, some anchors leave the noobj set
    assert float(m1.loss_noobj) < float(m0.loss_noobj)


def test_prior_loss_gate():
    gt = empty_targets()
    early = region_loss(raw_zeros(), gt, REGION, jnp.asarray(0))
    late = region_loss(raw_zeros(), gt, REGION, SEEN)
    # at raw=0: sigmoid=0.5 == prior center -> tx,ty terms 0; tw=th=0 too
    assert float(early.loss) == approx(float(late.loss))
    raw = jnp.full((1, H, W, A * (5 + C)), 0.3)
    early = region_loss(raw, gt, REGION, jnp.asarray(0))
    late = region_loss(raw, gt, REGION, SEEN)
    assert float(early.loss) > float(late.loss)


def test_rescore_vs_plain_objectness():
    plain = RegionLayer(anchors=REGION.anchors, classes=C, num=A,
                        rescore=False, object_scale=5.0)
    gt = jnp.asarray([[[1.0, 0.55, 0.3, 3.0 / W, 3.0 / H]]])
    raw = raw_zeros()
    m_rescore = region_loss(raw, gt, REGION, SEEN)
    m_plain = region_loss(raw, gt, plain, SEEN)
    # rescore target (iou < 1) vs target 1: plain demands more from to=0.5
    assert float(m_plain.loss_obj) > float(m_rescore.loss_obj)


def test_loss_differentiable_and_finite():
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.standard_normal((2, H, W, A * (5 + C)))
                      .astype(np.float32))
    gt = jnp.asarray([
        [[0.0, 0.2, 0.2, 0.3, 0.3], [1.0, 0.7, 0.7, 0.2, 0.4],
         [0, 0, 0, 0, 0]],
        [[3.0, 0.5, 0.5, 0.6, 0.6], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0]],
    ], jnp.float32)
    loss, g = jax.value_and_grad(
        lambda r: region_loss(r, gt, REGION, SEEN).loss)(raw)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_duplicate_cell_anchor_later_wins():
    """Two GT in same cell wanting the same anchor: exactly one anchor
    assigned (n_gt counts both, but scatter keeps one)."""
    gt = jnp.asarray([[[0.0, 0.56, 0.31, 3.0 / W, 3.0 / H],
                       [2.0, 0.58, 0.33, 3.1 / W, 3.1 / H]]])
    m = region_loss(raw_zeros(), gt, REGION, SEEN)
    assert float(m.n_gt) == 2

    def cls_loss(raw):
        return region_loss(raw, gt, REGION, SEEN).loss_cls

    g = np.asarray(jax.grad(cls_loss)(raw_zeros())).reshape(H, W, A, 5 + C)
    cells = np.nonzero(np.abs(g).sum(-1))
    assert len(list(zip(*cells))) == 1
