"""NMS tests (SURVEY.md §4.3): padded fixed-shape XLA NMS must exactly match
a trivial O(n^2) numpy greedy oracle on the unpadded set."""

import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.evaluation.nms import (
    batched_per_class_nms, nms_padded, nms_topk, per_class_nms,
)


def np_greedy_nms(boxes, scores, iou_thresh, score_thresh):
    """Oracle: classic greedy NMS, dynamic length."""
    def iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ua = (max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
              + max(b[2] - b[0], 0) * max(b[3] - b[1], 0) - inter)
        return inter / ua if ua > 0 else 0.0

    idx = [i for i in np.argsort(-scores, kind="stable")
           if scores[i] > score_thresh]
    keep = []
    while idx:
        i = idx.pop(0)
        keep.append(i)
        idx = [j for j in idx if iou(boxes[i], boxes[j]) <= iou_thresh]
    return keep


def random_boxes(rng, n):
    xy = rng.uniform(0, 1, (n, 2))
    wh = rng.uniform(0.05, 0.4, (n, 2))
    return np.concatenate([xy - wh / 2, xy + wh / 2], -1).astype(np.float32)


def test_matches_oracle_random():
    rng = np.random.default_rng(0)
    for trial in range(10):
        n = 50
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        want = np_greedy_nms(boxes, scores, 0.45, 0.1)
        sel, out_scores, valid = nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1, max_out=n)
        got_scores = np.asarray(out_scores)[np.asarray(valid)]
        np.testing.assert_allclose(got_scores, scores[want], rtol=1e-6)
        got_boxes = np.asarray(sel)[np.asarray(valid)]
        np.testing.assert_allclose(got_boxes, boxes[want], rtol=1e-6)


def test_all_below_threshold():
    rng = np.random.default_rng(1)
    boxes = random_boxes(rng, 10)
    scores = np.full(10, 0.01, np.float32)
    _, out_scores, valid = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.5, max_out=5)
    assert not np.asarray(valid).any()
    assert (np.asarray(out_scores) == 0).all()


def test_max_out_truncation():
    """More survivors than K slots: keep the top-K by score."""
    rng = np.random.default_rng(2)
    # disjoint boxes -> no suppression
    boxes = np.array([[i * 0.1, 0.0, i * 0.1 + 0.05, 0.05]
                      for i in range(10)], np.float32)
    scores = rng.permutation(np.linspace(0.1, 1.0, 10)).astype(np.float32)
    _, out_scores, valid = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.0, max_out=4)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(out_scores),
                               np.sort(scores)[::-1][:4], rtol=1e-6)


def test_identical_boxes_suppressed():
    boxes = np.tile(np.array([[0.1, 0.1, 0.5, 0.5]], np.float32), (5, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    _, out_scores, valid = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.0, max_out=5)
    assert np.asarray(valid).sum() == 1
    assert np.asarray(out_scores)[0] == np.float32(0.9)


def test_topk_matches_oracle_random():
    """nms_topk == classic greedy when K >= #above-threshold candidates."""
    rng = np.random.default_rng(7)
    for trial in range(10):
        n = 50
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        want = np_greedy_nms(boxes, scores, 0.45, 0.1)
        sel, out_scores, valid = nms_topk(
            jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1, max_out=n)
        v = np.asarray(valid)
        got_scores = np.asarray(out_scores)[v]
        # output is score-descending; oracle emits in the same order
        np.testing.assert_allclose(got_scores, scores[want], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sel)[v], boxes[want],
                                   rtol=1e-6)


def test_topk_equals_padded_with_ties():
    """Equal scores: top_k ties break by lower index, same as argmax."""
    boxes = np.array([[0.0, 0.0, 0.2, 0.2], [0.5, 0.5, 0.7, 0.7],
                      [0.01, 0.0, 0.21, 0.2], [0.5, 0.5, 0.7, 0.7]],
                     np.float32)
    scores = np.array([0.8, 0.8, 0.8, 0.8], np.float32)
    a = nms_topk(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.0, 4)
    b = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.0, 4)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]))


def test_topk_prefilter_semantics():
    """K < #candidates: greedy over the top-K scoring candidates."""
    rng = np.random.default_rng(8)
    n, k = 60, 16
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0.2, 1.0, n).astype(np.float32)
    top = np.argsort(-scores, kind="stable")[:k]
    want = np_greedy_nms(boxes[top], scores[top], 0.45, 0.1)
    _, out_scores, valid = nms_topk(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1, max_out=k)
    got = np.asarray(out_scores)[np.asarray(valid)]
    np.testing.assert_allclose(got, scores[top][want], rtol=1e-6)


def test_topk_pads_when_fewer_candidates_than_slots():
    boxes = random_boxes(np.random.default_rng(9), 5)
    scores = np.array([0.9, 0.0, 0.0, 0.0, 0.0], np.float32)
    sel, out_scores, valid = nms_topk(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1, max_out=12)
    assert sel.shape == (12, 4) and valid.shape == (12,)
    assert np.asarray(valid).sum() == 1 and np.asarray(valid)[0]


def test_per_class_independent():
    rng = np.random.default_rng(3)
    n, c = 30, 4
    boxes = random_boxes(rng, n)
    class_scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    sel, scores, valid = per_class_nms(
        jnp.asarray(boxes), jnp.asarray(class_scores), 0.45, 0.1, max_out=n)
    assert sel.shape == (c, n, 4)
    for ci in range(c):
        want = np_greedy_nms(boxes, class_scores[:, ci], 0.45, 0.1)
        got = np.asarray(scores[ci])[np.asarray(valid[ci])]
        np.testing.assert_allclose(got, class_scores[want, ci], rtol=1e-6)


def test_batched_shapes():
    rng = np.random.default_rng(4)
    b, n, c, k = 3, 20, 2, 7
    boxes = np.stack([random_boxes(rng, n) for _ in range(b)])
    cs = rng.uniform(0, 1, (b, n, c)).astype(np.float32)
    sel, scores, valid = batched_per_class_nms(
        jnp.asarray(boxes), jnp.asarray(cs), max_out=k)
    assert sel.shape == (b, c, k, 4)
    assert scores.shape == (b, c, k) and valid.shape == (b, c, k)


def test_topk_approx_prefilter_matches_exact():
    """exact_prefilter=False (approx_max_k + exact reorder) must produce
    the same selections as the exact-sort path — on CPU approx_max_k
    lowers to the exact reference, and the production contract is
    documented as recall-0.99 identical on TPU (docs/PERF.md)."""
    from modelcompression_tpu.evaluation.nms import nms_topk
    rng = np.random.default_rng(11)
    for trial in range(5):
        n = 845
        boxes = random_boxes(rng, n)
        scores = (rng.uniform(0, 1, n).astype(np.float32)) ** 4
        exact = nms_topk(jnp.asarray(boxes), jnp.asarray(scores),
                         0.45, 0.01, max_out=32, exact_prefilter=True)
        approx = nms_topk(jnp.asarray(boxes), jnp.asarray(scores),
                          0.45, 0.01, max_out=32, exact_prefilter=False)
        for a, b in zip(exact, approx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)
