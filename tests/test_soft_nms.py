"""Soft-NMS tests: the fixed-shape on-device soft-NMS
(evaluation/nms.soft_nms_topk) must exactly match a trivial numpy
implementation of Bodla et al. 2017 on the unpadded set, for both the
Gaussian and linear decay rules; plus EvalConfig wiring."""

import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.evaluation.nms import (
    batched_per_class_soft_nms, soft_nms_topk,
)

from tests.test_nms import random_boxes


def np_soft_nms(boxes, scores, iou_thresh, score_thresh, sigma,
                linear):
    """Oracle: classic soft-NMS, dynamic length — pick the max, decay
    the rest, emit while the decayed max clears score_thresh."""
    def iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ua = (max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
              + max(b[2] - b[0], 0) * max(b[3] - b[1], 0) - inter)
        return inter / ua if ua > 0 else 0.0

    live = {i: float(s) for i, s in enumerate(scores)
            if s > score_thresh}
    out = []  # (index, decayed score)
    while live:
        i = max(live, key=lambda k: live[k])
        s = live.pop(i)
        if s <= score_thresh:
            break
        out.append((i, s))
        for j in list(live):
            o = iou(boxes[i], boxes[j])
            if linear:
                w = 1.0 - o if o > iou_thresh else 1.0
            else:
                w = float(np.exp(-(o * o) / sigma))
            live[j] *= w
    return out


@pytest.mark.parametrize("linear", [False, True])
def test_matches_oracle_random(linear):
    rng = np.random.default_rng(7)
    for trial in range(8):
        n = 40
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        want = np_soft_nms(boxes, scores, 0.3, 0.1, 0.5, linear)
        sel, out_scores, valid = soft_nms_topk(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3, 0.1,
            max_out=n, sigma=0.5, linear=linear)
        valid = np.asarray(valid)
        got_scores = np.asarray(out_scores)[valid]
        got_boxes = np.asarray(sel)[valid]
        assert len(got_scores) == len(want)
        np.testing.assert_allclose(
            got_scores, [s for _, s in want], rtol=2e-5)
        np.testing.assert_allclose(
            got_boxes, boxes[[i for i, _ in want]], rtol=1e-6)
        # emitted in decayed-score order, non-increasing
        assert (np.diff(got_scores) <= 1e-6).all()


def test_non_overlapping_keep_original_scores():
    # disjoint boxes never decay each other (IoU 0 -> weight 1 in both
    # rules): soft-NMS must return every candidate with its original
    # score, descending.
    boxes = np.array([[i, 0.0, i + 0.5, 0.5] for i in range(6)],
                     np.float32)
    scores = np.array([0.9, 0.3, 0.7, 0.5, 0.8, 0.6], np.float32)
    for linear in (False, True):
        sel, out_scores, valid = soft_nms_topk(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3, 0.1,
            max_out=6, sigma=0.5, linear=linear)
        assert np.asarray(valid).all()
        np.testing.assert_allclose(np.asarray(out_scores),
                                   np.sort(scores)[::-1], rtol=1e-6)


def test_overlap_decays_but_survives():
    # two heavily overlapping boxes: greedy NMS erases the second, soft
    # NMS keeps it with a decayed score — the feature's whole point.
    boxes = np.array([[0, 0, 1, 1], [0.05, 0, 1.05, 1]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    sel, out_scores, valid = soft_nms_topk(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3, 1e-3,
        max_out=2, sigma=0.5)
    assert np.asarray(valid).tolist() == [True, True]
    got = np.asarray(out_scores)
    assert got[0] == pytest.approx(0.9, rel=1e-6)
    o = 0.95 / (2 - 0.95)  # IoU of the two unit boxes shifted by 0.05
    assert got[1] == pytest.approx(0.8 * np.exp(-o * o / 0.5), rel=1e-4)
    # the decayed box can drop below threshold and vanish
    _, out2, valid2 = soft_nms_topk(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3, 0.5,
        max_out=2, sigma=0.5)
    assert np.asarray(valid2).tolist() == [True, False]


def test_padding_and_truncation_shapes():
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 20)
    scores = rng.uniform(0.2, 1, 20).astype(np.float32)
    # max_out > n pads; max_out < n truncates to the top-K by original
    # score (the nms_topk graceful-truncation shape)
    sel, s, v = soft_nms_topk(jnp.asarray(boxes), jnp.asarray(scores),
                              0.3, 0.1, max_out=32)
    assert sel.shape == (32, 4) and s.shape == (32,) and v.shape == (32,)
    sel, s, v = soft_nms_topk(jnp.asarray(boxes), jnp.asarray(scores),
                              0.3, 0.1, max_out=5)
    assert sel.shape == (5, 4) and np.asarray(v).sum() <= 5


def test_batched_per_class_shapes_and_independence():
    rng = np.random.default_rng(5)
    b, n, c, k = 2, 30, 3, 8
    boxes = np.stack([random_boxes(rng, n) for _ in range(b)])
    cs = rng.uniform(0, 1, (b, n, c)).astype(np.float32)
    sel, s, v = batched_per_class_soft_nms(
        jnp.asarray(boxes), jnp.asarray(cs), max_out=k)
    assert sel.shape == (b, c, k, 4) and s.shape == (b, c, k)
    # each (image, class) slice equals the single call
    sel0, s0, v0 = soft_nms_topk(jnp.asarray(boxes[1]),
                                 jnp.asarray(cs[1, :, 2]), max_out=k)
    np.testing.assert_allclose(np.asarray(s[1, 2]), np.asarray(s0),
                               rtol=1e-6)


def test_eval_config_validation():
    from modelcompression_tpu.evaluation.pipeline import EvalConfig
    with pytest.raises(ValueError, match="soft_nms must be"):
        EvalConfig(soft_nms="nope")
    with pytest.raises(ValueError, match="mutually exclusive"):
        EvalConfig(soft_nms="gaussian", exact_nms=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        EvalConfig(soft_nms="linear", nms_prefilter=64)
    EvalConfig(soft_nms="gaussian")  # valid


def test_eval_step_soft_nms_end_to_end():
    """The fused eval program with soft_nms on: compiles, runs, returns
    the standard (B,C,K,...) contract, and actually dispatches to the
    soft path (scores decay where greedy's don't)."""
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
    step_s = make_eval_step(spec, EvalConfig(**base, soft_nms="gaussian"))
    _, sc_g, v_g, _, _ = step_g(params, jnp.asarray(imgs), w, h)
    sel, sc_s, v_s, n_cand, n_any = step_s(params, jnp.asarray(imgs), w, h)
    assert sel.shape == (2, 3, 16, 4) and v_s.shape == (2, 3, 16)
    assert int(np.asarray(v_s).sum()) > 0
    # greedy keeps original scores; soft decays overlapping ones — on a
    # dense random-init detection map the two must differ
    assert not np.allclose(np.asarray(sc_s), np.asarray(sc_g))
    # the top pick per (image, class) is never decayed: equal in both
    np.testing.assert_allclose(np.asarray(sc_s[..., 0]),
                               np.asarray(sc_g[..., 0]), rtol=1e-6)
