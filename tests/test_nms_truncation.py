"""NMS truncation: observable and escapable (SURVEY.md §7.4.2 "must still
exactly match the numpy oracle"; VERDICT r1 #4).

Constructs a scene with MORE candidates above threshold than the top-k
path's K slots and documents both modes:

* default ``nms_topk``: greedy over the top-K scoring candidates — can
  differ from exact greedy in this regime, and the eval pipeline reports
  the overflow fraction so the cap is never silent;
* ``exact_nms`` (``nms_padded`` per class): equals the numpy greedy
  oracle over ALL candidates regardless of K.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.evaluation import (
    EvalConfig, batched_per_class_nms_padded, evaluate, nms_padded,
    nms_topk,
)
from tests.test_nms import np_greedy_nms


def _overflow_scene(n=60, k=8, seed=0):
    """Spread-out boxes (little mutual suppression) so >k survive greedy
    and every candidate clears the threshold."""
    rng = np.random.default_rng(seed)
    gx, gy = np.meshgrid(np.arange(10), np.arange(6))
    cx = (gx.ravel()[:n] + 0.5) / 10.0
    cy = (gy.ravel()[:n] + 0.5) / 6.0
    w = np.full(n, 0.06)
    boxes = np.stack([cx - w / 2, cy - w / 2, cx + w / 2, cy + w / 2],
                     -1).astype(np.float32)
    scores = rng.uniform(0.5, 1.0, n).astype(np.float32)
    return boxes, scores


def test_exact_padded_matches_oracle_beyond_k():
    boxes, scores = _overflow_scene(n=60, k=8)
    want = np_greedy_nms(boxes, scores, 0.45, 0.1)
    assert len(want) > 8  # the scene genuinely exceeds K survivors

    # exact path with enough output slots == oracle, even though 60 > K
    sel, out_scores, valid = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1, max_out=60)
    np.testing.assert_allclose(np.asarray(out_scores)[np.asarray(valid)],
                               scores[want], rtol=1e-6)

    # top-k path with K=8 keeps only the 8 best-scoring candidates: it is
    # exact greedy on that subset (documented truncation semantics)
    selt, st, vt = nms_topk(jnp.asarray(boxes), jnp.asarray(scores),
                            0.45, 0.1, max_out=8)
    got = np.asarray(st)[np.asarray(vt)]
    # the kept scores are exactly the top-8 scores that survive greedy
    # among themselves (here: spread boxes -> all 8 survive)
    top8 = np.sort(scores)[-8:][::-1]
    np.testing.assert_allclose(got, top8, rtol=1e-6)
    assert len(got) < len(want)  # truncation really bit


def test_batched_padded_equals_per_cell_oracle():
    boxes, scores = _overflow_scene(n=40, seed=3)
    class_scores = np.stack([scores, scores[::-1]], -1)  # (N, 2)
    out_b, out_s, out_v = batched_per_class_nms_padded(
        jnp.asarray(boxes[None]), jnp.asarray(class_scores[None]),
        iou_thresh=0.45, score_thresh=0.1, max_out=40)
    for c in range(2):
        want = np_greedy_nms(boxes, class_scores[:, c], 0.45, 0.1)
        got = np.asarray(out_s)[0, c][np.asarray(out_v)[0, c]]
        np.testing.assert_allclose(got, class_scores[want, c], rtol=1e-6)


def test_class_agnostic_prefilter_exact_within_budget():
    """per_class_nms_prefiltered == per_class_nms whenever at most N'
    candidates have ANY class above threshold (the documented exactness
    condition), across classes with disjoint score patterns."""
    from modelcompression_tpu.evaluation import (
        per_class_nms, per_class_nms_prefiltered,
    )
    rng = np.random.default_rng(5)
    n, c = 200, 6
    xy = rng.uniform(0, 1, (n, 2))
    wh = rng.uniform(0.05, 0.3, (n, 2))
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1).astype(np.float32)
    scores = np.zeros((n, c), np.float32)
    # 80 candidates carry above-threshold scores for scattered classes
    hot = rng.choice(n, 80, replace=False)
    scores[hot, rng.integers(0, c, 80)] = rng.uniform(0.2, 1.0, 80)
    scores += rng.uniform(0, 1e-4, (n, c))  # sub-threshold noise, no ties

    base = per_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                         0.45, 0.1, max_out=16)
    pre = per_class_nms_prefiltered(jnp.asarray(boxes), jnp.asarray(scores),
                                    0.45, 0.1, max_out=16, prefilter=128)
    for a, b in zip(base, pre):  # 80 hot <= 128 budget -> identical
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # beyond the budget the result may differ — documented truncation
    tight = per_class_nms_prefiltered(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1, max_out=16,
        prefilter=32)
    kept = float(np.asarray(tight[2]).sum())
    assert kept <= float(np.asarray(base[2]).sum())


def test_bisect_prefilter_matches_topk_within_budget():
    """The sort-free bisect prefilter (VERDICT r3 #1) must equal the
    top_k prefilter path (and the unfiltered path) bit-for-bit whenever
    at most N' candidates have ANY class above threshold."""
    from modelcompression_tpu.evaluation import per_class_nms
    from modelcompression_tpu.evaluation.nms import (
        batched_per_class_nms_prefiltered,
    )
    rng = np.random.default_rng(9)
    b, n, c = 3, 200, 6
    xy = rng.uniform(0, 1, (b, n, 2))
    wh = rng.uniform(0.05, 0.3, (b, n, 2))
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1).astype(np.float32)
    scores = np.zeros((b, n, c), np.float32)
    for i in range(b):
        hot = rng.choice(n, 80, replace=False)
        scores[i, hot, rng.integers(0, c, 80)] = rng.uniform(0.2, 1.0, 80)
    scores += rng.uniform(0, 1e-4, (b, n, c))  # sub-threshold, no ties

    topk = batched_per_class_nms_prefiltered(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1, max_out=16,
        prefilter=128, impl="topk")
    bisect = batched_per_class_nms_prefiltered(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1, max_out=16,
        prefilter=128, impl="bisect")
    for a, bb_ in zip(topk, bisect):  # 80 hot <= 128 budget -> identical
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb_))
    base = jax.vmap(lambda bx, s: per_class_nms(
        bx, s, 0.45, 0.1, max_out=16))(jnp.asarray(boxes),
                                       jnp.asarray(scores))
    for a, bb_ in zip(base, bisect):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb_))

    # overflow regime: still exactly N' survivors, graceful truncation
    tight = batched_per_class_nms_prefiltered(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.1, max_out=16,
        prefilter=32, impl="bisect")
    assert float(np.asarray(tight[2]).sum()) <= \
        float(np.asarray(base[2]).sum())

    with np.testing.assert_raises(Exception):
        batched_per_class_nms_prefiltered(
            jnp.asarray(boxes), jnp.asarray(scores), impl="bogus")


def test_bisect_prefilter_overflow_keeps_topk_set():
    """In the overflow regime the bisect prefilter keeps exactly the
    top-N' candidates by max class score (tie-free scores): the kept
    max-score SET must equal lax.top_k's."""
    from modelcompression_tpu.evaluation.nms import batched_bisect_prefilter
    rng = np.random.default_rng(11)
    b, n, c = 2, 97, 3
    boxes = rng.uniform(0, 1, (b, n, 4)).astype(np.float32)
    scores = rng.uniform(0.2, 1.0, (b, n, c)).astype(np.float32)
    b2, cs2 = batched_bisect_prefilter(jnp.asarray(boxes),
                                       jnp.asarray(scores), 0.1, 24)
    m = scores.max(-1)
    for i in range(b):
        want = np.sort(m[i])[-24:]
        got = np.sort(np.asarray(cs2)[i].max(-1))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pipeline_prefilter_matches_default_when_within_budget(tmp_path):
    spec, params, samples = _eval_fixture(tmp_path)
    names = ["redbox", "greenbox", "bluebox"]
    # 64px tiny net: N = 2*2*5 = 20 candidates, far under the budget
    cfg = EvalConfig(batch_size=2, conf_thresh=0.005, max_detections=100)
    r_base = evaluate(params, spec, samples, names, cfg)
    r_pre = evaluate(params, spec, samples, names,
                     dataclasses.replace(cfg, nms_prefilter=16))
    assert r_base.map50 == r_pre.map50


def test_pipeline_prefilter_overflow_reported(tmp_path):
    """The class-agnostic prefilter's exactness budget is the per-IMAGE
    any-class candidate count — per-(image,class) cells can all be within
    max_detections while the prefilter still truncates. The eval result
    must expose that regime, and must not claim exactness in it."""
    spec, params, samples = _eval_fixture(tmp_path)
    names = ["redbox", "greenbox", "bluebox"]
    # 64px tiny net: N = 2*2*5 = 20 candidates; at conf 1e-6 on random
    # weights every candidate clears SOME class, so a budget of 4 is
    # exceeded on every image while max_detections=100 never overflows
    cfg = EvalConfig(batch_size=2, conf_thresh=1e-6, max_detections=100,
                     nms_prefilter=4)
    res = evaluate(params, spec, samples, names, cfg)
    assert res.nms_overflow_frac == 0.0          # per-class cells fine...
    assert res.prefilter_overflow_frac > 0.5     # ...but the budget blew
    assert res.prefilter_max_candidates > 4
    assert "class-agnostic prefilter" in res.summary()
    assert "exact-equal" not in res.summary()
    assert "audit" in res.summary()

    # generous budget: overflow 0, exactness claim restored
    res2 = evaluate(params, spec, samples, names,
                    dataclasses.replace(cfg, nms_prefilter=20))
    assert res2.prefilter_overflow_frac == 0.0
    assert "exact-equal" in res2.summary()


def test_exact_nms_and_prefilter_conflict_rejected():
    with pytest.raises(ValueError, match="mutually exclusive"):
        EvalConfig(exact_nms=True, nms_prefilter=8)


def _eval_fixture(tmp_path):
    from modelcompression_tpu.data.fixtures import (
        make_fake_voc, tiny_region_cfg,
    )
    from modelcompression_tpu.data.voc import load_list_dataset, read_data_cfg
    from modelcompression_tpu.models import init_params, parse_cfg
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=11)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    return spec, params, samples


def test_pipeline_reports_overflow_and_exact_mode(tmp_path):
    """An untrained model at a tiny K floods the NMS (the exact scenario
    VERDICT r1 flagged): the eval result must EXPOSE the overflow, and the
    exact_nms switch must run the all-candidates path end-to-end."""
    spec, params, samples = _eval_fixture(tmp_path)
    names = ["redbox", "greenbox", "bluebox"]

    # near-zero threshold + tiny K: every cell overflows on random weights
    cfg = EvalConfig(batch_size=2, conf_thresh=1e-6, max_detections=4)
    res = evaluate(params, spec, samples, names, cfg)
    assert res.nms_overflow_frac > 0.5
    assert res.nms_max_candidates > 4
    assert not res.exact_nms
    assert "exceeded" in res.summary()

    exact = evaluate(params, spec, samples, names,
                     dataclasses.replace(cfg, exact_nms=True))
    assert exact.exact_nms
    assert "exact greedy" in exact.summary()
    # overflow accounting is reported in both modes
    assert exact.nms_max_candidates == res.nms_max_candidates

    # at a sane threshold/K (the mAP defaults) the fixture does NOT
    # overflow and both modes agree exactly
    cfg2 = EvalConfig(batch_size=2, conf_thresh=0.005, max_detections=100)
    r1 = evaluate(params, spec, samples, names, cfg2)
    r2 = evaluate(params, spec, samples, names,
                  dataclasses.replace(cfg2, exact_nms=True))
    assert r1.nms_overflow_frac == 0.0
    assert r1.map50 == r2.map50
