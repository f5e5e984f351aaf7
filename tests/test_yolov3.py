"""YOLOv3 family tests (second detector family beyond the YOLOv2 parity
surface): [shortcut] residual adds, [upsample], multi-scale [yolo] heads
with anchor masks, sigmoid (multi-label) class decode, and the
family-generic decode_heads/eval plumbing.

Oracle strategy mirrors SURVEY.md §4.1: the JAX NHWC model must match the
in-repo torch NCHW oracle end-to-end at fp32 tolerance under BITMATCH."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.data.fixtures import (
    FIXTURE_CLASSES, make_fake_voc, tiny_yolo3_cfg,
)
from modelcompression_tpu.data.voc import load_list_dataset, read_data_cfg
from modelcompression_tpu.evaluation import (
    EvalConfig, batched_per_class_nms, center_to_corners, decode_heads,
    decode_yolo, evaluate, mean_ap,
)
from modelcompression_tpu.evaluation.voc_map import Detection, GroundTruth
from modelcompression_tpu.models import (
    dump_cfg, fold_batchnorm, forward, forward_folded, init_params,
    load_weights, parse_cfg, save_weights, upsample_nearest,
    yolov3_coco, yolov3_tiny_coco, yolov3_tiny_voc, yolov3_voc,
)
from modelcompression_tpu.models.cfg import (
    ConvLayer, RouteLayer, ShortcutLayer, UpsampleLayer, YoloLayer,
)
from tests.oracle.torch_ref import torch_forward


def nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2)))


# ---------------------------------------------------------------- cfg layer


def test_parse_fixture_v3_structure():
    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    assert spec.is_multi_head
    assert spec.classes == 3
    heads = [spec.layers[i] for i in spec.head_indices()]
    assert [type(l) for l in heads] == [YoloLayer, YoloLayer]
    coarse, fine = heads
    assert coarse.mask == (2, 3) and fine.mask == (0, 1)
    assert coarse.n == 2
    # anchor_pairs selects THIS scale's subset from the shared pixel list
    assert coarse.anchor_pairs == ((24.0, 24.0), (48.0, 48.0))
    assert fine.anchor_pairs == ((8.0, 8.0), (16.0, 16.0))
    assert any(isinstance(l, ShortcutLayer) for l in spec.layers)
    assert any(isinstance(l, UpsampleLayer) for l in spec.layers)


def test_shortcut_from_is_absolute_and_validated():
    spec = parse_cfg(tiny_yolo3_cfg())
    sc = next(l for l in spec.layers if isinstance(l, ShortcutLayer))
    idx = spec.layers.index(sc)
    assert 0 <= sc.from_layer < idx  # resolved to an absolute earlier index
    bad = tiny_yolo3_cfg().replace("from=-3", "from=-99")
    with pytest.raises(ValueError, match="shortcut"):
        parse_cfg(bad)


def test_shortcut_channel_mismatch_rejected():
    # point the residual add at the 16-channel conv (layer 0) while the
    # current tensor is 32 channels -> must fail at channel resolution
    bad = tiny_yolo3_cfg().replace("from=-3", "from=0")
    with pytest.raises(ValueError, match="channel mismatch"):
        parse_cfg(bad)


@pytest.mark.parametrize("zoo_fn,n_layers,n_convs,head_idx", [
    (yolov3_coco, 107, 75, [82, 94, 106]),
    (yolov3_voc, 107, 75, [82, 94, 106]),
    (yolov3_tiny_coco, 24, 13, [16, 23]),
    (yolov3_tiny_voc, 24, 13, [16, 23]),
])
def test_zoo_v3_canonical_structure(zoo_fn, n_layers, n_convs, head_idx):
    """The bundled cfgs must reproduce the public graph shape exactly —
    loading public yolov3(-tiny).weights depends on the conv walk order,
    and the FPN routes must hit the canonical backbone taps."""
    spec = zoo_fn()
    assert len(spec.layers) == n_layers
    assert len(spec.conv_indices()) == n_convs
    assert spec.head_indices() == head_idx
    if n_layers == 107:
        # FPN lateral taps: route->61 (end of 512 stage), route->36 (256)
        taps = [l.layers for l in spec.layers if isinstance(l, RouteLayer)
                and len(l.layers) == 2]
        assert [t[1] for t in taps] == [61, 36]
        assert sum(isinstance(l, ShortcutLayer) for l in spec.layers) == 23
    masks = [spec.layers[i].mask for i in spec.head_idx] \
        if hasattr(spec, "head_idx") else \
        [spec.layers[i].mask for i in spec.head_indices()]
    assert masks[0][0] > masks[-1][0]  # coarse head owns the big anchors


def test_cfg_roundtrip_v3():
    for text in (tiny_yolo3_cfg(),):
        spec = parse_cfg(text)
        assert parse_cfg(dump_cfg(spec)) == spec
    for fn in (yolov3_coco, yolov3_voc, yolov3_tiny_coco, yolov3_tiny_voc):
        spec = fn()
        assert parse_cfg(dump_cfg(spec)) == spec, fn.__name__


# ---------------------------------------------------------------- forward


def test_upsample_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 7, 6)).astype(np.float32)  # NCHW
    want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="nearest").numpy()
    got = nchw(np.asarray(upsample_nearest(jnp.asarray(nhwc(x)), 2)))
    np.testing.assert_array_equal(got, want)
    want3 = F.interpolate(torch.from_numpy(x), scale_factor=3,
                          mode="nearest").numpy()
    got3 = nchw(np.asarray(upsample_nearest(jnp.asarray(nhwc(x)), 3)))
    np.testing.assert_array_equal(got3, want3)


def _oracle_check_forward(spec, seed=0, tol=5e-5):
    params = init_params(spec, jax.random.key(seed))
    rng = np.random.default_rng(seed)
    b, h, w = 2, spec.net.height, spec.net.width
    x = rng.random((b, h, w, 3), np.float32)
    raws = forward(params, jnp.asarray(x), spec, BITMATCH)
    assert isinstance(raws, tuple) and len(raws) == len(spec.head_indices())
    ref = torch_forward(params, nchw(x), spec)
    for got, want_nchw in zip(raws, ref):
        np.testing.assert_allclose(np.asarray(got), nhwc(want_nchw),
                                   atol=tol, rtol=1e-5)
    return params, x, raws


def test_fixture_v3_forward_matches_oracle():
    spec = parse_cfg(tiny_yolo3_cfg())
    _oracle_check_forward(spec)


def test_real_tiny_v3_forward_matches_oracle():
    """The genuine yolov3-tiny graph (stride-1 tail maxpool, route -4
    crossing a [yolo] layer, 5-pool backbone) at a reduced input size."""
    spec = yolov3_tiny_voc()
    spec = dataclasses.replace(
        spec, net=dataclasses.replace(spec.net, width=160, height=160))
    _oracle_check_forward(spec, seed=1, tol=2e-4)


def test_v3_folded_forward_matches_unfolded():
    spec = parse_cfg(tiny_yolo3_cfg())
    params = init_params(spec, jax.random.key(2))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    raws = forward(params, x, spec, BITMATCH)
    folded = fold_batchnorm(params, spec)
    raws_f = forward_folded(folded, x, spec, BITMATCH)
    for a, b in zip(raws, raws_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


# ---------------------------------------------------------------- decode


def _numpy_decode_yolo(raw, layer, net_h, net_w):
    """Independent numpy transcription of yolo_layer.c's box decode."""
    b, h, w, _ = raw.shape
    a, c = layer.n, layer.classes
    raw = raw.reshape(b, h, w, a, 5 + c).astype(np.float64)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    anchors = np.asarray(layer.anchor_pairs, np.float64)
    boxes = np.zeros((b, h, w, a, 4))
    for i in range(h):
        for j in range(w):
            for k in range(a):
                boxes[:, i, j, k, 0] = (sig(raw[:, i, j, k, 0]) + j) / w
                boxes[:, i, j, k, 1] = (sig(raw[:, i, j, k, 1]) + i) / h
                boxes[:, i, j, k, 2] = (
                    anchors[k, 0] * np.exp(raw[:, i, j, k, 2]) / net_w)
                boxes[:, i, j, k, 3] = (
                    anchors[k, 1] * np.exp(raw[:, i, j, k, 3]) / net_h)
    obj = sig(raw[..., 4])
    cls = sig(raw[..., 5:])
    n = h * w * a
    return (boxes.reshape(b, n, 4), obj.reshape(b, n),
            cls.reshape(b, n, c))


def test_decode_yolo_matches_numpy_oracle():
    layer = YoloLayer(mask=(1, 2), anchors=(10, 14, 23, 27, 37, 58),
                      classes=4, num=3)
    rng = np.random.default_rng(3)
    raw = rng.standard_normal((2, 5, 7, 2 * 9)).astype(np.float32)
    want = _numpy_decode_yolo(raw, layer, net_h=160, net_w=224)
    got = decode_yolo(jnp.asarray(raw), layer, net_h=160, net_w=224)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w_, atol=1e-5, rtol=1e-5)


def test_decode_yolo_classes_are_sigmoid_not_softmax():
    """v3 class scores are independent sigmoids: all-zero logits decode to
    0.5 each (a softmax would give 1/C)."""
    layer = YoloLayer(mask=(0,), anchors=(8, 8), classes=5, num=1)
    raw = jnp.zeros((1, 2, 2, 10))
    _, _, cls = decode_yolo(raw, layer, net_h=64, net_w=64)
    np.testing.assert_allclose(np.asarray(cls), 0.5, atol=1e-6)


def test_decode_heads_concatenates_scales_in_network_order():
    spec = parse_cfg(tiny_yolo3_cfg())
    params = init_params(spec, jax.random.key(4))
    x = jnp.asarray(np.random.default_rng(4).random((1, 64, 64, 3),
                                                    np.float32))
    raws = forward(params, x, spec, BITMATCH)
    boxes, obj, cls = decode_heads(raws, spec)
    heads = [spec.layers[i] for i in spec.head_indices()]
    parts = [decode_yolo(r, l, 64, 64) for r, l in zip(raws, heads)]
    np.testing.assert_array_equal(
        np.asarray(boxes),
        np.concatenate([np.asarray(p[0]) for p in parts], axis=1))
    n = sum(int(np.asarray(p[1]).shape[1]) for p in parts)
    assert obj.shape == (1, n) and cls.shape == (1, n, 3)


def test_decode_heads_rejects_head_count_mismatch():
    spec = parse_cfg(tiny_yolo3_cfg())
    one = jnp.zeros((1, 8, 8, 16))
    with pytest.raises(ValueError, match="multi-head"):
        decode_heads((one,), spec)  # spec has 2 heads


# ---------------------------------------------------------------- weights


def test_v3_weights_roundtrip(tmp_path):
    spec = parse_cfg(tiny_yolo3_cfg())
    params = init_params(spec, jax.random.key(5))
    path = str(tmp_path / "v3.weights")
    save_weights(path, spec, params)
    loaded, _seen = load_weights(path, spec)
    flat0, _ = jax.tree_util.tree_flatten_with_path(params)
    flat1 = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    assert len(flat0) == len(flat1)
    for key, a in flat0:
        np.testing.assert_array_equal(np.asarray(a),
                                      np.asarray(flat1[key]), str(key))


# ------------------------------------------------------------ eval / e2e


def logit(p):
    return float(np.log(p / (1 - p)))


def encode_boxes_to_v3_raws(labels, spec):
    """Inverse of decode_heads for [cls, cx, cy, w, h] rows (normalized):
    each truth goes to its best-matching anchor's head at the right cell;
    all other objectness logits pinned to -12."""
    heads = [spec.layers[i] for i in spec.head_indices()]
    net_h, net_w = spec.net.height, spec.net.width
    strides = {0: 8, 1: 4}  # fixture: coarse head stride 8, fine stride 4
    raws = []
    grids = []
    for hi, l in enumerate(heads):
        g = net_h // strides[hi]
        raw = np.zeros((1, g, g, l.n, 5 + l.classes), np.float32)
        raw[..., 4] = -12.0
        raws.append(raw)
        grids.append(g)
    all_anchors = []  # (head_idx, slot, pw_pix, ph_pix)
    for hi, l in enumerate(heads):
        for s, (pw, ph) in enumerate(l.anchor_pairs):
            all_anchors.append((hi, s, pw, ph))
    for cls, cx, cy, w, h in labels:
        wp, hp = w * net_w, h * net_h
        best = min(all_anchors,
                   key=lambda t: abs(np.log(wp / t[2])) +
                   abs(np.log(hp / t[3])))
        hi, s, pw, ph = best
        g = grids[hi]
        j = min(int(cx * g), g - 1)
        i = min(int(cy * g), g - 1)
        fx = np.clip(cx * g - j, 0.01, 0.99)
        fy = np.clip(cy * g - i, 0.01, 0.99)
        raws[hi][0, i, j, s, 0] = logit(fx)
        raws[hi][0, i, j, s, 1] = logit(fy)
        raws[hi][0, i, j, s, 2] = np.log(wp / pw)
        raws[hi][0, i, j, s, 3] = np.log(hp / ph)
        raws[hi][0, i, j, s, 4] = 12.0
        raws[hi][0, i, j, s, 5 + int(cls)] = 12.0
    return tuple(jnp.asarray(r.reshape(1, g, g, -1))
                 for r, g in zip(raws, grids))


def test_oracle_raw_maps_give_perfect_map(tmp_path):
    """Invert the v3 decode for the fixture ground truth, push the raw
    maps through the REAL post-network path (decode_heads -> per-class
    NMS -> VOC AP) and require mAP == 1.0 — pins the whole multi-head
    eval stack end-to-end (same strategy as the [region] twin in
    test_eval_pipeline.py)."""
    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    data_cfg = make_fake_voc(str(tmp_path), n_images=6, image_size=416,
                             seed=3)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    dets = {c: [] for c in FIXTURE_CLASSES}
    gts = {c: [] for c in FIXTURE_CLASSES}
    for s in samples:
        raws = encode_boxes_to_v3_raws(s.labels, spec)
        boxes, obj, cls = decode_heads(raws, spec)
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
                if int(cls_id) != ci:
                    continue
                gts[cname].append(GroundTruth(s.image_id, (
                    cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)))
    m, per_class = mean_ap(dets, gts, iou_thresh=0.5)
    assert m == pytest.approx(1.0, abs=1e-6), per_class


def test_evaluate_v3_end_to_end(tmp_path):
    """Full evaluate() on the v3 fixture with random weights: exercises
    make_eval_step's multi-head path (decode_heads inside the fused
    program), result structure sane."""
    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(0))
    data_cfg = make_fake_voc(str(tmp_path), n_images=4, image_size=96,
                             seed=1)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    cfg = EvalConfig(batch_size=2, max_detections=10)
    res = evaluate(params, spec, samples, FIXTURE_CLASSES, cfg)
    assert res.n_images == 4
    assert 0.0 <= res.map50 <= 1.0
    assert set(res.per_class_ap) <= set(FIXTURE_CLASSES)
