"""DIoU-NMS tests (Zheng et al. 2020): greedy suppression on
IoU - rho^2/c^2 > thresh. Both fixed-shape device paths (nms_padded and
nms_topk) must match a trivial numpy oracle and each other."""

import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.evaluation.nms import (
    diou_penalty, nms_padded, nms_topk, pairwise_diou_penalty,
)

from tests.test_nms import random_boxes


def np_diou_greedy(boxes, scores, iou_thresh, score_thresh):
    """Oracle: classic greedy loop with the DIoU criterion."""
    def iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ua = (max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
              + max(b[2] - b[0], 0) * max(b[3] - b[1], 0) - inter)
        return inter / ua if ua > 0 else 0.0

    def penalty(a, b):
        rho2 = (((a[0] + a[2]) - (b[0] + b[2])) / 2) ** 2 \
            + (((a[1] + a[3]) - (b[1] + b[3])) / 2) ** 2
        c2 = (max(a[2], b[2]) - min(a[0], b[0])) ** 2 \
            + (max(a[3], b[3]) - min(a[1], b[1])) ** 2
        return rho2 / c2 if c2 > 0 else 0.0

    idx = [i for i in np.argsort(-scores, kind="stable")
           if scores[i] > score_thresh]
    keep = []
    while idx:
        i = idx.pop(0)
        keep.append(i)
        idx = [j for j in idx
               if iou(boxes[i], boxes[j])
               - penalty(boxes[i], boxes[j]) <= iou_thresh]
    return keep


def test_penalty_helpers_agree():
    rng = np.random.default_rng(0)
    a, b = random_boxes(rng, 7), random_boxes(rng, 5)
    mat = np.asarray(pairwise_diou_penalty(jnp.asarray(a),
                                           jnp.asarray(b)))
    for i in range(7):
        row = np.asarray(diou_penalty(jnp.asarray(a[i]), jnp.asarray(b)))
        np.testing.assert_allclose(mat[i], row, rtol=1e-6)
    # self-penalty is zero, and penalty is within [0, 1)
    self_mat = np.asarray(pairwise_diou_penalty(jnp.asarray(a),
                                                jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(self_mat), 0.0, atol=1e-7)
    assert (mat >= 0).all() and (mat < 1).all()


@pytest.mark.parametrize("path", ["padded", "topk"])
def test_matches_oracle_random(path):
    rng = np.random.default_rng(11)
    for trial in range(8):
        n = 40
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        want = np_diou_greedy(boxes, scores, 0.45, 0.1)
        fn = nms_padded if path == "padded" else nms_topk
        sel, out_scores, valid = fn(
            jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1,
            max_out=n, diou=True)
        valid = np.asarray(valid)
        got_scores = np.asarray(out_scores)[valid]
        got_boxes = np.asarray(sel)[valid]
        assert len(got_scores) == len(want)
        np.testing.assert_allclose(got_scores, scores[want], rtol=1e-6)
        np.testing.assert_allclose(got_boxes, boxes[want], rtol=1e-6)


def test_diou_spares_distant_equal_overlap():
    """Two overlap pairs with the SAME IoU: centers close -> suppressed
    in both modes; centers far (tall/wide overlap) -> DIoU spares the
    second box where plain greedy erases it."""
    # pair A: concentric squares (rho=0 -> penalty 0): both criteria
    # suppress at IoU 0.64 > 0.45
    boxes = np.array([
        [0.0, 0.0, 1.0, 1.0], [0.1, 0.1, 0.9, 0.9],
        # pair B: long horizontal strips overlapping along their length,
        # IoU 0.5, but centers 0.25 apart over a short diagonal
        [2.0, 0.0, 3.0, 0.2], [2.5, 0.0, 3.5, 0.2],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.9, 0.8], np.float32)
    # plain: pair A second suppressed (IoU .64), pair B IoU = 1/3 < .45
    # -> kept by both; tighten thresh so plain suppresses pair B too
    thresh = 0.3
    _, s_plain, v_plain = nms_padded(jnp.asarray(boxes),
                                     jnp.asarray(scores), thresh, 0.1,
                                     max_out=4)
    _, s_diou, v_diou = nms_padded(jnp.asarray(boxes),
                                   jnp.asarray(scores), thresh, 0.1,
                                   max_out=4, diou=True)
    n_plain = int(np.asarray(v_plain).sum())
    n_diou = int(np.asarray(v_diou).sum())
    # IoU(B) = 1/3 > 0.3 -> plain suppresses; penalty(B) large enough
    # that 1/3 - p < 0.3 -> DIoU keeps
    assert n_plain == 2 and n_diou == 3
    # concentric pair stays suppressed under DIoU (penalty 0 there)
    oracle = np_diou_greedy(boxes, scores, thresh, 0.1)
    assert len(oracle) == 3


def test_eval_config_wiring():
    from modelcompression_tpu.evaluation.pipeline import EvalConfig
    with pytest.raises(ValueError, match="mutually exclusive"):
        EvalConfig(soft_nms="gaussian", diou_nms=True)
    # composes with the greedy variants
    EvalConfig(diou_nms=True, exact_nms=True)
    EvalConfig(diou_nms=True, nms_prefilter=64)


def test_eval_step_diou_end_to_end():
    """Fused eval program with diou_nms: runs, keeps the contract, and
    on this fixed fixture returns at least as many detections as plain
    greedy (the per-pair DIoU criterion is weaker: IoU - penalty <= IoU;
    the cascade makes that only a per-pair, not a global, guarantee —
    hence the fixed seed)."""
    import jax
    from modelcompression_tpu.data.fixtures import tiny_region_cfg
    from modelcompression_tpu.evaluation.pipeline import (
        EvalConfig, make_eval_step,
    )
    from modelcompression_tpu.models import (
        fold_batchnorm, init_params, parse_cfg,
    )

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = fold_batchnorm(init_params(spec, jax.random.key(0)), spec)
    imgs = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3), np.uint8)
    w = jnp.asarray([64.0, 64.0])
    h = jnp.asarray([64.0, 64.0])
    base = dict(batch_size=2, conf_thresh=0.05, max_detections=16)
    step_g = make_eval_step(spec, EvalConfig(**base))
    step_d = make_eval_step(spec, EvalConfig(**base, diou_nms=True))
    _, sc_g, v_g, _, _ = step_g(params, jnp.asarray(imgs), w, h)
    sel, sc_d, v_d, _, _ = step_d(params, jnp.asarray(imgs), w, h)
    assert sel.shape == (2, 3, 16, 4)
    assert int(np.asarray(v_d).sum()) >= int(np.asarray(v_g).sum()) > 0
