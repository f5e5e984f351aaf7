"""Eval pipeline integration tests (SURVEY.md §4.5).

The key test bypasses the conv stack: construct a raw feature map by
*inverting* the region decode for the fixture ground truth, push it through
the real device path (decode -> per-class NMS) and the VOC AP protocol, and
require mAP == 1.0. This pins the whole post-network eval stack end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from modelcompression_tpu.data.fixtures import (
    FIXTURE_CLASSES, make_fake_voc, tiny_region_cfg,
)
from modelcompression_tpu.data.voc import load_list_dataset, read_data_cfg
from modelcompression_tpu.evaluation import (
    EvalConfig, batched_per_class_nms, center_to_corners, decode_region,
    evaluate, mean_ap,
)
from modelcompression_tpu.evaluation.voc_map import Detection, GroundTruth
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.models.cfg import RegionLayer


def logit(p):
    return float(np.log(p / (1 - p)))


def encode_boxes_to_raw(labels, region: RegionLayer, grid: int
                        ) -> np.ndarray:
    """Inverse of decode_region for a list of [cls, cx, cy, w, h] rows."""
    a, c = region.num, region.classes
    raw = np.zeros((grid, grid, a, 5 + c), np.float32)
    raw[..., 4] = -12.0  # objectness ~ 0 everywhere else
    anchors = np.asarray(region.anchor_pairs)
    used = set()
    for cls, cx, cy, w, h in labels:
        j = min(int(cx * grid), grid - 1)
        i = min(int(cy * grid), grid - 1)
        # pick the best-matching anchor by shape (free slot)
        order = np.argsort([abs(np.log(max(w * grid, 1e-6) / pw))
                            + abs(np.log(max(h * grid, 1e-6) / ph))
                            for pw, ph in anchors])
        ai = next((x for x in order if (i, j, x) not in used), order[0])
        used.add((i, j, int(ai)))
        fx = np.clip(cx * grid - j, 0.01, 0.99)
        fy = np.clip(cy * grid - i, 0.01, 0.99)
        raw[i, j, ai, 0] = logit(fx)
        raw[i, j, ai, 1] = logit(fy)
        raw[i, j, ai, 2] = np.log(w * grid / anchors[ai, 0])
        raw[i, j, ai, 3] = np.log(h * grid / anchors[ai, 1])
        raw[i, j, ai, 4] = 12.0
        raw[i, j, ai, 5 + int(cls)] = 12.0
    return raw.reshape(1, grid, grid, a * (5 + c))


def test_oracle_raw_map_gives_perfect_map(tmp_path):
    spec = parse_cfg(tiny_region_cfg(num_classes=3))
    region = spec.region
    data_cfg = make_fake_voc(str(tmp_path), n_images=6, image_size=416,
                             seed=3)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])

    dets = {c: [] for c in FIXTURE_CLASSES}
    gts = {c: [] for c in FIXTURE_CLASSES}
    for s in samples:
        raw = encode_boxes_to_raw(s.labels, region, grid=13)
        boxes, obj, cls = decode_region(jnp.asarray(raw), region)
        corners = center_to_corners(boxes)
        scores = obj[..., None] * cls
        sel, out_scores, valid = batched_per_class_nms(
            corners, scores, iou_thresh=0.45, score_thresh=0.1, max_out=20)
        sel, out_scores, valid = jax.device_get((sel, out_scores, valid))
        for ci, cname in enumerate(FIXTURE_CLASSES):
            for k in np.nonzero(valid[0, ci])[0]:
                dets[cname].append(Detection(
                    s.image_id, float(out_scores[0, ci, k]),
                    tuple(sel[0, ci, k])))
        for cls_id, cx, cy, w, h in s.labels:
            gts[FIXTURE_CLASSES[int(cls_id)]].append(GroundTruth(
                s.image_id,
                (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)))

    m, per_class = mean_ap(dets, gts, use_07_metric=True)
    assert m == pytest.approx(1.0), per_class
    m2, _ = mean_ap(dets, gts, use_07_metric=False)
    assert m2 == pytest.approx(1.0)


def test_evaluate_end_to_end_smoke(tmp_path):
    """Full evaluate() on the fixture with random weights at low res:
    exercises host batching, device program, geometry mapping, AP — the
    structure must be sane even though the model detects nothing."""
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=128, height=128))
    params = init_params(spec, jax.random.key(0))
    data_cfg = make_fake_voc(str(tmp_path), n_images=5, image_size=160,
                             seed=1)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    cfg = EvalConfig(batch_size=2, max_detections=10)
    res = evaluate(params, spec, samples, FIXTURE_CLASSES, cfg)
    assert res.n_images == 5
    assert 0.0 <= res.map50 <= 1.0
    assert set(res.per_class_ap) <= set(FIXTURE_CLASSES)
    assert "mAP@50" in res.summary()
    # compile/steady-state split (VERDICT r2 weak #4): the first batch
    # carries the XLA compile; the steady-state figure must exclude it.
    # 3 batches of 2 here -> the multi-batch path. On a cold program the
    # compile dwarfs per-batch execution, so steady > overall strictly.
    assert res.compile_s > 0.0
    assert res.images_per_sec_steady > res.images_per_sec
    assert "steady-state" in res.summary()


def test_evaluate_single_batch_steady_state(tmp_path):
    """Single-batch runs can't split wall time; evaluate() times one
    re-execution of the already-compiled program instead, so even the
    2-image fixture eval prints a steady-state number that does not
    include compile."""
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=128, height=128))
    params = init_params(spec, jax.random.key(0))
    data_cfg = make_fake_voc(str(tmp_path), n_images=2, image_size=160,
                             seed=1)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    cfg = EvalConfig(batch_size=8, max_detections=10)
    res = evaluate(params, spec, samples, FIXTURE_CLASSES, cfg)
    assert res.n_images == 2
    assert res.compile_s > 0.0
    assert res.images_per_sec_steady > res.images_per_sec
    assert "steady-state" in res.summary()


def test_evaluate_map_iou_threshold(tmp_path):
    """EvalConfig.map_iou threads through to AP matching and the summary
    label (mAP@75 audits localization quality; the IoU-boundary math
    itself is pinned in test_voc_map.test_iou_threshold_boundary)."""
    import dataclasses
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=128, height=128))
    params = init_params(spec, jax.random.key(0))
    data_cfg = make_fake_voc(str(tmp_path), n_images=2, image_size=160,
                             seed=1)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    cfg = EvalConfig(batch_size=2, max_detections=10, map_iou=0.75)
    res = evaluate(params, spec, samples, FIXTURE_CLASSES, cfg)
    assert res.map_iou == 0.75
    assert "mAP@75" in res.summary() and "AP@75" in res.summary()
    with pytest.raises(ValueError, match="map_iou"):
        dataclasses.replace(cfg, map_iou=0.0)
    with pytest.raises(ValueError, match="map_iou"):
        dataclasses.replace(cfg, map_iou=1.5)


def test_evaluate_coco_map(tmp_path):
    """EvalConfig.coco_map populates the @[.50:.95] fields from the same
    detection lists (ladder math pinned in test_voc_map); off by default
    the fields stay None and the summary stays VOC-only."""
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=128, height=128))
    params = init_params(spec, jax.random.key(0))
    data_cfg = make_fake_voc(str(tmp_path), n_images=3, image_size=160,
                             seed=1)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    cfg = EvalConfig(batch_size=2, max_detections=10, coco_map=True)
    res = evaluate(params, spec, samples, FIXTURE_CLASSES, cfg)
    assert res.map_coco is not None
    assert 0.0 <= res.map_coco <= 1.0
    # AP at a stricter IoU can't exceed AP@.5, so the all-point ladder
    # mean is bounded by the all-point AP@.5 per class
    assert set(res.per_class_ap_coco) == set(res.per_class_ap)
    assert "mAP@[.50:.95]" in res.summary()
    assert "AP@[.50:.95]" in res.summary()  # per-class column header
    # size-band diagnostics ride along (band math pinned in test_voc_map)
    assert set(res.map_coco_area) == {"small", "medium", "large"}
    assert any(ap is not None for ap in res.map_coco_area.values())
    assert "AP by object size:" in res.summary()

    cfg_off = EvalConfig(batch_size=2, max_detections=10)
    res_off = evaluate(params, spec, samples, FIXTURE_CLASSES, cfg_off)
    assert res_off.map_coco is None
    assert res_off.map_coco_area is None
    assert "mAP@[.50:.95]" not in res_off.summary()


def test_letterbox_device_matches_host():
    """Device letterbox must produce (approximately) the host canvas: same
    geometry, same pad value, bilinear content within resampler tolerance."""
    from modelcompression_tpu.data.preprocess import (
        GRAY, letterbox_device, letterbox_host,
    )
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (120, 200, 3), np.uint8)
    host, r, px, py = letterbox_host(img, 128, 128)
    dev = np.asarray(letterbox_device(jnp.asarray(img)[None], 128, 128))[0]
    assert dev.shape == (128, 128, 3)
    # pad rows identical and equal to GRAY
    assert np.allclose(dev[:py], GRAY / 255.0)
    assert np.abs(host[:py].astype(np.float32) / 255.0 - dev[:py]).max() == 0
    # content region: both are bilinear resamples of the same image
    content_h = host[py:py + round(120 * r)].astype(np.float32) / 255.0
    content_d = dev[py:py + round(120 * r)]
    assert np.abs(content_h - content_d).mean() < 0.02


def test_fused_eval_step_src_hw(tmp_path):
    """src_hw mode: raw fixed-size sources in, letterbox fused on device,
    boxes returned in source pixels."""
    from modelcompression_tpu.evaluation import make_eval_step
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=128, height=128))
    params = init_params(spec, jax.random.key(0))
    from modelcompression_tpu.models.darknet import fold_batchnorm
    folded = fold_batchnorm(params, spec)
    cfg = EvalConfig(batch_size=2, max_detections=10, conf_thresh=1e-4)
    step = make_eval_step(spec, cfg, src_hw=(96, 160))
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 96, 160, 3), np.uint8))
    img_w = jnp.full((2,), 160.0)
    img_h = jnp.full((2,), 96.0)
    boxes, scores, valid, n_cand, n_any = step(folded, imgs, img_w, img_h)
    # n_any counts DISTINCT candidates with any class above threshold, so
    # it is bounded by the per-class total and at least the worst class
    assert n_any.shape == (2,)
    assert (np.asarray(n_any) >= np.asarray(n_cand).max(axis=1)).all()
    assert (np.asarray(n_any) <= np.asarray(n_cand).sum(axis=1)).all()
    assert boxes.shape == (2, 3, 10, 4)
    b = np.asarray(boxes)[np.asarray(valid)]
    assert len(b) > 0  # random net at 1e-4 conf produces something
    assert (b[:, 0::2] >= 0).all() and (b[:, 0::2] <= 160).all()
    assert (b[:, 1::2] >= 0).all() and (b[:, 1::2] <= 96).all()
    # deterministic
    boxes2, _, valid2, _, _ = step(folded, imgs, img_w, img_h)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid2))
    np.testing.assert_array_equal(np.asarray(boxes), np.asarray(boxes2))


def test_dump_detections_format(tmp_path):
    from modelcompression_tpu.evaluation import EvalResult, dump_detections
    res = EvalResult(
        map50=0.5, per_class_ap={"redbox": 0.5},
        detections={"redbox": [
            Detection("img0001", 0.7, (1.0, 2.0, 3.0, 4.0)),
            Detection("img0002", 0.9, (5.0, 6.0, 7.0, 8.0))]},
        n_images=2, images_per_sec=1.0, use_07_metric=True)
    dump_detections(res, str(tmp_path / "dets"))
    path = tmp_path / "dets" / "comp4_det_test_redbox.txt"
    lines = path.read_text().strip().splitlines()
    # sorted by descending score
    assert lines[0].split()[0] == "img0002"
    assert len(lines[0].split()) == 6


def test_prep_batch_threaded_matches_serial(tmp_path):
    """_prep_batch with a ThreadPoolExecutor must produce byte-identical
    output to the serial path (each worker writes disjoint batch rows).
    On the real TPU host the pool is sized to the machine; this pins the
    multi-worker branch even on a 1-core CI box."""
    import concurrent.futures
    from modelcompression_tpu.evaluation.pipeline import _prep_batch
    data_cfg = make_fake_voc(str(tmp_path), n_images=6, image_size=96,
                             seed=3)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    serial = _prep_batch(samples, 64, 64, letterbox=True)
    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        threaded = _prep_batch(samples, 64, 64, letterbox=True,
                               executor=pool)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)
