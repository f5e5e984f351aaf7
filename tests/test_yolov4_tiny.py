"""YOLOv4-tiny family tests (third detector family): CSP grouped
[route] splits (groups=2, group_id=1), mish activation, and the
scale_x_y grid-sensitivity decode — on top of the v3 machinery.

Oracle strategy mirrors tests/test_yolov3.py: the JAX NHWC model must
match the in-repo torch NCHW oracle end-to-end at fp32 tolerance under
BITMATCH; decode math is hand-computed; compression invariants reuse the
slimmed==masked prize test."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.data.fixtures import tiny_yolo4_cfg
from modelcompression_tpu.models import (
    dump_cfg, forward, init_params, num_conv_flops, num_params, parse_cfg,
    yolov4_tiny_coco, yolov4_tiny_voc,
)
from modelcompression_tpu.models.cfg import RouteLayer, YoloLayer
from tests.oracle.torch_ref import torch_forward


def nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2)))


# ---------------------------------------------------------------- cfg layer


def test_parse_fixture_v4_structure():
    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3))
    assert spec.is_multi_head and spec.classes == 3
    grouped = [l for l in spec.layers
               if isinstance(l, RouteLayer) and l.groups > 1]
    assert len(grouped) == 1
    assert grouped[0].groups == 2 and grouped[0].group_id == 1
    heads = [spec.layers[i] for i in spec.head_indices()]
    assert all(h.scale_x_y == pytest.approx(1.05) for h in heads)
    assert any(l.activation == "mish" for l in spec.layers
               if hasattr(l, "activation"))
    # roundtrip preserves the v4-only fields
    spec2 = parse_cfg(dump_cfg(spec))
    g2 = [l for l in spec2.layers
          if isinstance(l, RouteLayer) and l.groups > 1][0]
    assert (g2.groups, g2.group_id) == (2, 1)
    assert [l.scale_x_y for l in spec2.layers
            if isinstance(l, YoloLayer)] == [1.05, 1.05]


def test_grouped_route_validation():
    bad = tiny_yolo4_cfg().replace("group_id=1", "group_id=2")
    with pytest.raises(ValueError, match="group_id"):
        parse_cfg(bad)
    # 3 groups does not divide the 40-channel source
    bad = tiny_yolo4_cfg().replace("groups=2", "groups=3")
    with pytest.raises(ValueError, match="divisible"):
        parse_cfg(bad)


def test_canonical_yolov4_tiny_counts():
    """The bundled cfg reproduces the published yolov4-tiny numbers:
    ~6.06M params, ~6.91 GFLOP (published 6.9 BFLOPs) at 416, heads at
    13x13 (mask 3,4,5) and 26x26 (mask 1,2,3), scale_x_y=1.05."""
    spec = yolov4_tiny_coco()
    params = init_params(spec, jax.random.key(0))
    assert num_params(params) / 1e6 == pytest.approx(6.06, abs=0.02)
    assert num_conv_flops(spec) / 1e9 == pytest.approx(6.91, abs=0.05)
    heads = [spec.layers[i] for i in spec.head_indices()]
    assert heads[0].mask == (3, 4, 5) and heads[1].mask == (1, 2, 3)
    assert all(h.scale_x_y == pytest.approx(1.05) for h in heads)
    voc = yolov4_tiny_voc()
    assert voc.classes == 20

    x = jnp.zeros((1, 416, 416, 3))
    outs = forward(params, x, spec, BITMATCH)
    assert [tuple(o.shape) for o in outs] == [(1, 13, 13, 255),
                                              (1, 26, 26, 255)]


# ------------------------------------------------------------ forward oracle


def test_fixture_forward_matches_torch_oracle():
    """End-to-end NHWC-vs-NCHW equality through the CSP split, mish and
    both heads (fp32, BITMATCH)."""
    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(1))
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)

    want = torch_forward(jax.tree.map(np.asarray, params), x, spec)
    got = forward(params, jnp.asarray(nhwc(x)), spec, BITMATCH)
    assert len(want) == len(got) == 2
    for w, g in zip(want, got):
        np.testing.assert_allclose(nhwc(w), np.asarray(g),
                                   rtol=2e-5, atol=2e-5)


def test_mish_matches_torch():
    from modelcompression_tpu.models.darknet import _activate
    x = np.linspace(-6, 6, 101).astype(np.float32)
    want = F.mish(torch.from_numpy(x)).numpy()
    got = np.asarray(_activate(jnp.asarray(x), "mish"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_route_part_slices_second_half():
    from modelcompression_tpu.models.darknet import route_part
    t = jnp.arange(2 * 3 * 3 * 8).reshape(2, 3, 3, 8).astype(jnp.float32)
    l = RouteLayer(layers=(0,), groups=2, group_id=1)
    np.testing.assert_array_equal(np.asarray(route_part(t, l)),
                                  np.asarray(t[..., 4:]))
    l0 = RouteLayer(layers=(0,))
    assert route_part(t, l0) is t


# ---------------------------------------------------------------- decode


def test_scale_x_y_decode_hand_computed():
    """bx = (s*sigmoid(tx) - (s-1)/2 + cx)/W: at tx=0 the offset is
    s/2 - (s-1)/2 = 0.5 (cell center, unchanged); at tx -> +inf it
    reaches s - (s-1)/2 = (s+1)/2 > 1 (past the cell edge — the point
    of the fix)."""
    from modelcompression_tpu.evaluation.decode import decode_yolo

    layer = YoloLayer(mask=(0,), anchors=(16.0, 16.0), classes=1, num=1,
                      scale_x_y=1.05)
    raw = np.zeros((1, 2, 2, 6), np.float32)  # A=1, 5+C=6
    raw[0, 0, 0, 0] = 10.0  # tx ~ +inf in cell (0,0)
    boxes, obj, cls = decode_yolo(jnp.asarray(raw), layer, 64, 64)
    bx = np.asarray(boxes)[0, :, 0].reshape(2, 2)
    s = 1.05
    # cell (0,0): (s*sig(10) - 0.025 + 0)/2
    want00 = (s / (1 + np.exp(-10.0)) - (s - 1) / 2) / 2
    assert bx[0, 0] == pytest.approx(want00, rel=1e-5)
    assert bx[0, 0] > 0.5  # past the classic sigmoid ceiling of the cell
    # tx=0 cells decode to the cell center exactly, any s
    assert bx[0, 1] == pytest.approx((0.5 + 1.0) / 2, rel=1e-5)


def test_scale_x_y_loss_gradient_matches_darknet_delta():
    """The xy loss term's logit gradient must equal darknet's delta
    s*(t - (s*sig(z) - (s-1)/2)) — the s^2-weighted BCE on the rescaled
    target is its exact antiderivative."""
    from modelcompression_tpu.train.yolo_loss import _bce_kl

    s = 1.05
    z = jnp.asarray(0.7)
    t = 0.3  # fractional target

    def loss(z):
        t_s = (t + (s - 1) / 2) / s
        return s * s * _bce_kl(z, t_s)

    g = float(jax.grad(loss)(z))
    sig = 1 / (1 + np.exp(-0.7))
    want = -s * (t - (s * sig - (s - 1) / 2))  # d/dz of the loss
    assert g == pytest.approx(want, rel=1e-5)


# ------------------------------------------------------------- compression


def test_grouped_route_sources_protected_or_balanced():
    """Schedule/budget paths keep grouped-route sources protected
    (their per-layer fractions can't express the balance constraint);
    the uniform path prunes them with split-balanced keep-sets via
    csp_split_constraints."""
    from modelcompression_tpu.compress.graph import (
        csp_split_constraints, grouped_route_protected_convs,
        grouped_route_source_convs, protected_conv_indices,
    )
    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3))
    src = grouped_route_source_convs(spec)
    assert src == {1}  # the mish conv feeding the CSP split
    assert src <= protected_conv_indices(spec)
    assert csp_split_constraints(spec) == {1: 2}
    # single-conv provenance -> balanceable, not hard-protected
    assert grouped_route_protected_convs(spec) == set()


def test_v4_slimmed_equals_masked():
    """The prize invariant through a CSP split: 50% L1-filter prune with
    the CSP source pruned via a split-BALANCED keep-set (same count
    dropped per half — criteria.csp_balanced_keep_sets, merged in by
    default), physical repack — slimmed forward == masked forward."""
    from modelcompression_tpu.compress import (
        channel_masks_from_keep, repack, uniform_filter_fraction_keep_sets,
    )

    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(2))
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    # the CSP source conv (40ch, groups=2) IS pruned — balanced: 10 kept
    # in each 20-channel half
    assert 1 in keep and len(keep[1]) == 20
    k1 = np.asarray(keep[1])
    assert int((k1 < 20).sum()) == int((k1 >= 20).sum()) == 10
    new_spec, new_params = repack(spec, params, keep)
    assert new_spec.layers[1].filters == 20
    masks = channel_masks_from_keep(spec, keep)

    x = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    y_masked = forward(params, x, spec, BITMATCH, channel_masks=masks)
    y_slim = forward(new_params, x, new_spec, BITMATCH)
    for a, b in zip(y_slim, y_masked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    assert num_params(new_params) < num_params(params)

    # a hand-built UNBALANCED keep-set on the CSP source fails loudly
    bad = dict(keep)
    bad[1] = np.arange(20)  # keeps only the first half
    with pytest.raises(ValueError, match="split-balanced"):
        repack(spec, params, bad)


def test_v4_train_step_runs_and_loss_finite():
    """The one-program train step (incl. the scale_x_y loss form)
    executes on the v4 fixture with a finite decreasing loss."""
    from modelcompression_tpu.train import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )

    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(4))
    config = TrainConfig.from_spec(spec, augment_flip=False,
                                   augment_jitter=0.0, precision=BITMATCH,
                                   max_boxes=4)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(5))
    step = make_train_step(spec, config, tx)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.integers(0, 255, (4, 64, 64, 3), np.uint8))
    tg = np.zeros((4, 4, 5), np.float32)
    tg[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    tg = jnp.asarray(tg)
    losses = []
    for _ in range(8):
        state, m = step(state, imgs, tg)
        assert np.isfinite(float(m["loss"]))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_v4_eval_pipeline_end_to_end():
    """The fused eval step (letterbox+forward+decode_heads+NMS) serves
    the family: finite detections in source-pixel bounds."""
    from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
    from modelcompression_tpu.models import fold_batchnorm

    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(6))
    folded = fold_batchnorm(params, spec)
    cfg = EvalConfig(batch_size=2, conf_thresh=1e-4, max_detections=8)
    step = make_eval_step(spec, cfg, src_hw=(80, 96))
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 80, 96, 3), np.uint8))
    boxes, scores, valid, n_cand, n_any = step(
        folded, imgs, jnp.full((2,), 96.0), jnp.full((2,), 80.0))
    assert np.isfinite(np.asarray(scores)).all()
    b = np.asarray(boxes)[np.asarray(valid)]
    if b.size:
        assert (b[:, [0, 2]] <= 96.0 + 1e-3).all()
        assert (b[:, [1, 3]] <= 80.0 + 1e-3).all()


def test_v4_prune_cli_writes_balanced_slim_cfg(tmp_path):
    """prune CLI end-to-end on the v4 fixture: the slimmed cfg keeps the
    grouped route aligned (parse revalidates divisibility) and the CSP
    source is balance-pruned, not protected."""
    from modelcompression_tpu.cli import prune as prune_cli
    from modelcompression_tpu.models import load_cfg, save_weights

    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(10))
    cfg_path = str(tmp_path / "v4.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp_path / "v4.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    out = str(tmp_path / "slim.weights")
    rc = prune_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--mode", "l1_filter", "--fraction", "0.5",
                         "--out", out])
    assert rc == 0
    slim = load_cfg(str(tmp_path / "slim.cfg"))  # revalidates the route
    assert slim.layers[1].filters == 20  # 40ch CSP source halved
    g = [l for l in slim.layers
         if isinstance(l, RouteLayer) and l.groups > 1][0]
    assert (g.groups, g.group_id) == (2, 1)


def test_v4_serve_family(tmp_path):
    """The serving daemon serves the v4 family unchanged (family-generic
    fused step through the CSP split + scale_x_y decode)."""
    import json
    import threading
    import urllib.request

    cv2 = pytest.importorskip("cv2")
    from modelcompression_tpu.cli import serve
    from modelcompression_tpu.models import save_weights

    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(11))
    cfg_path = str(tmp_path / "v4.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp_path / "v4.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)

    args = serve.build_parser().parse_args(
        ["--cfg", cfg_path, "--weights", wpath, "--port", "0",
         "--batch", "1", "--max-wait-ms", "10", "--conf", "0.05"])
    httpd, state = serve.build_server(args)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        rng = np.random.default_rng(12)
        img = rng.integers(0, 255, (72, 96, 3), np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=bytes(buf),
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["width"] == 96 and out["height"] == 72
        for d in out["detections"]:
            assert 0 <= d["class_id"] < 3
    finally:
        state.stop.set()
        httpd.shutdown()
        httpd.server_close()


def test_v4_int8_ptq_tracks_f32():
    """int8 PTQ through the CSP split: the grouped route's int8 slice
    rides its source's scale group; quantized outputs stay close to f32
    on the fixture."""
    from modelcompression_tpu.compress import (
        forward_quantized, quantize_from_batches,
    )
    from modelcompression_tpu.models import fold_batchnorm

    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3))
    params = init_params(spec, jax.random.key(8))
    folded = fold_batchnorm(params, spec)
    rng = np.random.default_rng(9)
    calib = [rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)]
    q = quantize_from_batches(folded, spec, calib)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    yq = forward_quantized(q, x, spec)
    yf = forward(params, x, spec, BITMATCH)
    for a, b in zip(yq, yf):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        # PTQ error, not equality: bounded relative to the f32 range
        scale = max(float(np.abs(b).max()), 1e-3)
        assert float(np.abs(a - b).max()) / scale < 0.15


def test_multi_provenance_grouped_route_source_not_balanced():
    """ADVICE r4: a conv that is the SOLE source of one grouped route
    (so it lands in csp_split_constraints) while ALSO contributing to a
    multi-conv tensor sliced by another grouped route must stay fully
    protected — balancing one source cannot keep the multi-source
    slice boundary valid. Before the fix, csp_balanced_keep_sets pruned
    it and repack failed late; now it is excluded up front."""
    from modelcompression_tpu.compress import (
        uniform_filter_fraction_keep_sets,
    )
    from modelcompression_tpu.compress.criteria import (
        csp_balanced_keep_sets,
    )
    from modelcompression_tpu.compress.graph import (
        csp_split_constraints, grouped_route_protected_convs,
    )

    txt = """
[net]
width=16
height=16
channels=3
batch=1

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[route]
layers=0,1

[route]
layers=2
groups=2
group_id=0

[route]
layers=0
groups=2
group_id=1

[route]
layers=3,4

[convolutional]
size=1
stride=1
pad=1
filters=18
activation=linear

[region]
anchors = 1,1, 2,2
classes=4
num=2
"""
    spec = parse_cfg(txt)
    # conv0: sole source of route@4 -> in the balance-constraint map...
    assert 0 in csp_split_constraints(spec)
    # ...but ALSO a contributor to route@2's concat, sliced by route@3
    # (multi-conv provenance) -> hard-protected
    assert grouped_route_protected_convs(spec) == {0, 1}
    # so the balanced builder must NOT emit a keep-set for it
    assert csp_balanced_keep_sets(params_for(spec), spec, 0.5) == {}
    keep = uniform_filter_fraction_keep_sets(spec, params_for(spec), 0.5)
    assert 0 not in keep and 1 not in keep


def params_for(spec):
    return init_params(spec, jax.random.key(11))
