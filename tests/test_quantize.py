"""Int8 post-training quantization (compress/quantize.py).

Covers: scale-group correctness (route concat must be single-scale),
an exactness construction (grid-aligned weights/inputs -> quantized conv
== f32 conv), closeness on the random tiny net, the pool/quant
commutation property that makes int8 maxpool exact, and composition with
structured repack. The accuracy-retention evidence on the TRAINED
fixture lives in test_learnability.py (reuses its 600-step model).
"""

import numpy as np
import jax
import jax.numpy as jnp

from modelcompression_tpu.compress import (
    repack, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.compress.quantize import (
    _scale_groups, collect_act_absmax,
    forward_quantized, int8_layers_auto, quantize_from_batches,
    quantize_network,
)
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import init_params, parse_cfg, yolov2_voc
from modelcompression_tpu.models.cfg import RouteLayer
from modelcompression_tpu.models.darknet import fold_batchnorm


def test_scale_groups_merge_route_inputs():
    """Every route's inputs (and the route itself) share one scale group
    on the full YOLOv2 spec — the concat-exactness invariant."""
    spec = yolov2_voc()
    groups = _scale_groups(spec)
    n_routes = 0
    for i, l in enumerate(spec.layers):
        if isinstance(l, RouteLayer):
            n_routes += 1
            for a in l.layers:
                assert groups[a] == groups[i], (i, l.layers, groups[a])
    assert n_routes >= 2  # yolov2 has the passthrough routes


def test_single_conv_exact_on_aligned_grid():
    """Inputs and weights exactly representable on the int8 grid ->
    the quantized conv equals the f32 conv to float tolerance."""
    cfg = """
[net]
width=8
height=8
channels=3

[convolutional]
filters=4
size=3
stride=1
pad=1
activation=linear

[region]
anchors=1.0,1.0
num=1
classes=1
"""
    spec = parse_cfg(cfg)
    rng = np.random.default_rng(0)
    # weights: integer multiples of 1/127 in [-1, 1]; EVERY output
    # channel's absmax touches 1.0 so the per-channel scale is exactly
    # 1/127 and w/s_w round-trips to the integer grid
    w_int = rng.integers(-127, 128, (3, 3, 3, 4)).astype(np.float32)
    w_int[0, 0, 0, :] = 127.0
    params = {"conv0": {"w": jnp.asarray(w_int / 127.0),
                        "bias": jnp.zeros(4, jnp.float32)}}
    # inputs: integer multiples of 1/127 in [0, 1], max touching 1.0
    x_int = rng.integers(0, 128, (1, 8, 8, 3)).astype(np.float32)
    x_int.flat[0] = 127.0
    x = jnp.asarray(x_int / 127.0)

    absmax, in_max = collect_act_absmax(params, spec, [np.asarray(x)])
    q = quantize_network(params, spec, absmax, input_absmax=in_max)
    got = forward_quantized(q, x, spec)

    ref = jax.lax.conv_general_dilated(
        x, params["conv0"]["w"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quantized_forward_close_to_f32():
    """Random tiny net: the int8 raw map tracks the f32 raw map within
    normal per-tensor-PTQ error (the net has convs, pools, and a region
    tail; normalized RMSE is the right closeness metric for a raw map)."""
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = fold_batchnorm(init_params(spec, jax.random.key(0)), spec)
    rng = np.random.default_rng(1)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
               for _ in range(2)]
    q = quantize_from_batches(params, spec, batches)

    x = jnp.asarray(batches[0])
    from modelcompression_tpu.core import BITMATCH
    from modelcompression_tpu.models.darknet import forward_folded
    ref = np.asarray(forward_folded(params, x, spec, BITMATCH))
    got = np.asarray(forward_quantized(q, x, spec))
    assert got.shape == ref.shape
    nrmse = np.sqrt(np.mean((got - ref) ** 2)) / (np.std(ref) + 1e-9)
    assert nrmse < 0.15, nrmse


def test_maxpool_commutes_with_quantization():
    """max(round(x/s)) == round(max(x)/s) for s > 0 — the property that
    lets int8 flow straight through maxpool with no extra error."""
    rng = np.random.default_rng(2)
    x = rng.uniform(-3, 3, (1, 8, 8, 4)).astype(np.float32)
    s = 3.0 / 127.0
    from modelcompression_tpu.models.cfg import MaxPoolLayer
    pool = MaxPoolLayer(size=2, stride=2)
    from modelcompression_tpu.models.darknet import maxpool
    q_then_pool = maxpool(
        jnp.clip(jnp.round(jnp.asarray(x) / s), -127, 127
                 ).astype(jnp.int8), pool)
    pool_then_q = jnp.clip(
        jnp.round(maxpool(jnp.asarray(x), pool) / s), -127, 127
    ).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(q_then_pool),
                                  np.asarray(pool_then_q))


def test_quantize_composes_with_repack():
    """A structurally repacked (slimmed) model quantizes and runs like
    the dense one — pruning x quantization composition."""
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(3))
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    slim_spec, slim_params = repack(spec, params, keep)
    folded = fold_batchnorm(slim_params, slim_spec)
    rng = np.random.default_rng(4)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
    q = quantize_from_batches(folded, slim_spec, batches)
    out = forward_quantized(q, jnp.asarray(batches[0]), slim_spec)
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()


def test_hybrid_subsets_track_f32():
    """Hybrid quantization (int8_layers=): every contiguous-suffix
    subset and an int8 ISLAND (boundary on both sides) produce a raw map
    close to f32, and the empty subset IS the bf16 FAST forward."""
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = fold_batchnorm(init_params(spec, jax.random.key(0)), spec)
    rng = np.random.default_rng(1)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
    x = jnp.asarray(batches[0])

    from modelcompression_tpu.core import BITMATCH
    from modelcompression_tpu.models.darknet import forward_folded
    ref = np.asarray(forward_folded(params, x, spec, BITMATCH))

    conv_ids = [i for i, l in enumerate(spec.layers)
                if type(l).__name__ == "ConvLayer"]
    subsets = ([conv_ids[k:] for k in range(len(conv_ids) + 1)]
               + [conv_ids[1:2]])  # island: conv in the middle
    for sel in subsets:
        q = quantize_from_batches(params, spec, batches, int8_layers=sel)
        got = np.asarray(forward_quantized(q, x, spec))
        nrmse = np.sqrt(np.mean((got - ref) ** 2)) / (np.std(ref) + 1e-9)
        # bf16-only path still carries bf16 rounding; int8 adds PTQ error
        assert nrmse < 0.15, (sel, nrmse)


def test_int8_layers_auto_rule():
    """The auto rule selects exactly the convs with both channel dims >=
    the threshold, walking Cin through pool/route/reorg correctly."""
    spec = yolov2_voc()
    sel = set(int8_layers_auto(spec, min_channels=128))
    for i, l in enumerate(spec.layers):
        if type(l).__name__ != "ConvLayer":
            assert i not in sel
            continue
        cin = l.in_channels  # filled by cfg._resolve_channels
        assert (i in sel) == (min(cin, l.filters) >= 128), (i, cin)
    # yolov2: conv1 (3->32) and conv2 (32->64) must be excluded, the
    # 26x26/13x13 512/1024 blocks included
    assert 0 not in sel
    names = [(i, spec.layers[i].in_channels, spec.layers[i].filters)
             for i in sorted(sel)]
    assert all(min(c, f) >= 128 for _, c, f in names)
    assert len(sel) >= 10


def test_dp_sharded_int8_eval_matches_single_device():
    """The int8 fused eval step under an 8-device DP mesh (batch sharded,
    quantized pytree replicated) equals the single-device int8 step
    exactly — quantization x data-parallel composition (SURVEY.md §2.3;
    int8 convs are deterministic integer ops, so this is bit-equality)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
    from tests.conftest import cpu_devices

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    folded = fold_batchnorm(init_params(spec, jax.random.key(9)), spec)
    rng = np.random.default_rng(10)
    q = quantize_from_batches(
        folded, spec, [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)])
    cfg = EvalConfig(batch_size=8, conf_thresh=1e-4, max_detections=8,
                     forward_fn=lambda p, x, s: forward_quantized(p, x, s))
    images = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3), np.uint8))
    img_w = jnp.full((8,), 96.0)
    img_h = jnp.full((8,), 80.0)

    step = make_eval_step(spec, cfg)
    b1, s1, v1, _, _ = step(q, images, img_w, img_h)

    mesh = Mesh(np.array(cpu_devices()), ("data",))
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    b2, s2, v2, _, _ = step(
        jax.device_put(q, rep),
        jax.device_put(images, NamedSharding(mesh, P("data", None,
                                                     None, None))),
        jax.device_put(img_w, dp), jax.device_put(img_h, dp))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-6, atol=1e-4)


def test_qmodel_save_load_roundtrip(tmp_path):
    """save_qmodel -> load_qmodel: the loaded pytree is field-for-field
    identical (int8 weights and f32 scales round-trip exactly through
    npz, hybrid float-conv entries included), forward_quantized output is
    BIT-identical, standalone load rebuilds the spec from the embedded
    cfg, and the architecture guard rejects a mismatched spec."""
    import pytest

    from modelcompression_tpu.compress import load_qmodel, save_qmodel

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = fold_batchnorm(init_params(spec, jax.random.key(11)), spec)
    rng = np.random.default_rng(12)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
    conv_ids = [i for i, l in enumerate(spec.layers)
                if type(l).__name__ == "ConvLayer"]
    # hybrid subset: conv0 stays a float {w, bias} entry, the rest int8
    q = quantize_from_batches(params, spec, batches,
                              int8_layers=conv_ids[1:])

    path = str(tmp_path / "model.qz")
    save_qmodel(path, q, spec)
    q2, spec2 = load_qmodel(path, spec=spec)
    assert spec2 is spec
    assert set(q2) == set(q)
    for key in q:
        assert set(q2[key]) == set(q[key]), key
        for field, v in q[key].items():
            got = np.asarray(q2[key][field])
            assert got.dtype == np.asarray(v).dtype, (key, field)
            np.testing.assert_array_equal(got, np.asarray(v), err_msg=key)

    x = jnp.asarray(batches[0])
    np.testing.assert_array_equal(
        np.asarray(forward_quantized(q, x, spec)),
        np.asarray(forward_quantized(q2, x, spec)))

    # standalone: the embedded cfg rebuilds the architecture
    q3, spec3 = load_qmodel(path)
    assert len(spec3.layers) == len(spec.layers)
    out = forward_quantized(q3, x, spec3)
    assert np.isfinite(np.asarray(out)).all()

    # guard: a different head (classes=2 changes the final conv) rejects
    other = parse_cfg(tiny_region_cfg(num_classes=2, width=64, height=64))
    with pytest.raises(ValueError, match="different architecture"):
        load_qmodel(path, spec=other)


def test_eval_pipeline_int8_smoke(tmp_path):
    """EvalConfig.forward_fn routes the fused eval program through the
    quantized forward end-to-end (letterbox -> int8 net -> decode -> NMS
    -> AP)."""
    import dataclasses
    from modelcompression_tpu.data.fixtures import (
        FIXTURE_CLASSES, make_fake_voc,
    )
    from modelcompression_tpu.data.voc import (
        load_list_dataset, read_data_cfg,
    )
    from modelcompression_tpu.evaluation import EvalConfig, evaluate

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = fold_batchnorm(init_params(spec, jax.random.key(5)), spec)
    data_cfg = make_fake_voc(str(tmp_path), n_images=4, image_size=96,
                             seed=6)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    rng = np.random.default_rng(7)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
    q = quantize_from_batches(params, spec, batches)

    cfg = EvalConfig(batch_size=2, max_detections=10,
                     forward_fn=lambda p, x, s: forward_quantized(p, x, s))
    res = evaluate(q, spec, samples, FIXTURE_CLASSES, cfg)
    assert res.n_images == 4
    assert 0.0 <= res.map50 <= 1.0


def test_scale_groups_pool_first_uses_input_scale():
    """Regression (round-2 self-review): a scale-preserving layer at
    index 0 must join the NETWORK INPUT's scale group — Python negative
    indexing used to merge it with the LAST layer's group, sizing early
    grids by the head's absmax (80x resolution loss on this net)."""
    from modelcompression_tpu.compress.quantize import (
        _layer_out_scales, _scale_groups,
    )

    cfg = """
[net]
height=32
width=32
channels=3

[maxpool]
size=2
stride=2

[convolutional]
filters=8
size=1
stride=1
pad=0
activation=leaky

[convolutional]
filters=33
size=1
stride=1
pad=0
activation=linear

[region]
anchors = 1.0,1.0
classes=6
num=1
"""
    spec = parse_cfg(cfg)
    groups = _scale_groups(spec)
    # pool (layer 0) shares the trailing input-node group, and neither
    # joins the head's group
    assert groups[0] == groups[-1]
    assert groups[0] != groups[2]
    out_scale, in_scale = _layer_out_scales(
        spec, act_absmax=[1.0, 5.0, 80.0, 80.0], input_absmax=1.0)
    # the pool's grid is sized by max(input, pool out) = 1.0, not 80
    assert abs(out_scale[0] - 1.0 / 127.0) < 1e-9
    assert abs(in_scale - 1.0 / 127.0) < 1e-9
    # the head group is untouched
    assert abs(out_scale[2] - 80.0 / 127.0) < 1e-9


def test_int8_input_bit_equals_float_input():
    """Integer-domain input stage: an int8 canvas quantized by
    ``quantize_canvas`` on the pytree's own input grid produces the
    BIT-SAME forward as the float canvas (forward_quantized applies the
    identical f32 round internally), and the fused eval program with
    ``int8_input=True`` returns bit-identical detections on both the
    src_hw (device letterbox) and generic paths."""
    import dataclasses

    from modelcompression_tpu.data.preprocess import quantize_canvas
    from modelcompression_tpu.evaluation import EvalConfig, make_eval_step

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = fold_batchnorm(init_params(spec, jax.random.key(2)), spec)
    rng = np.random.default_rng(3)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
    q = quantize_from_batches(params, spec, batches)

    # raw forward level
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    x8 = quantize_canvas(x, q["__net__"]["input_scale"])
    assert x8.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(forward_quantized(q, x, spec)),
        np.asarray(forward_quantized(q, x8, spec)))

    # fused eval program level (letterbox emits the int8 canvas)
    cfg = EvalConfig(batch_size=2, max_detections=10, conf_thresh=0.01,
                     forward_fn=lambda p, xx, s: forward_quantized(p, xx, s))
    cfg8 = dataclasses.replace(cfg, int8_input=True)
    w = jnp.asarray([80.0, 80.0])
    h = jnp.asarray([48.0, 48.0])
    for src_hw in ((48, 80), None):
        shape = (2, *src_hw, 3) if src_hw else (2, 64, 64, 3)
        imgs = jnp.asarray(rng.integers(0, 255, shape, np.uint8))
        out = make_eval_step(spec, cfg, src_hw=src_hw)(q, imgs, w, h)
        out8 = make_eval_step(spec, cfg8, src_hw=src_hw)(q, imgs, w, h)
        for a, b in zip(out, out8):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_input_with_float_first_conv_dequants():
    """Hybrid whose FIRST conv stays float still accepts an int8 canvas:
    the forward dequantizes at the boundary (tracking the input grid),
    so the result tracks the float-input hybrid within the input-quant
    error. (Perf note: this combination re-materializes a float canvas,
    so production int8_input pairs with an int8 first conv.)"""
    from modelcompression_tpu.data.preprocess import quantize_canvas
    from modelcompression_tpu.models.cfg import ConvLayer

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = fold_batchnorm(init_params(spec, jax.random.key(4)), spec)
    rng = np.random.default_rng(5)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
    conv_ids = [i for i, l in enumerate(spec.layers)
                if isinstance(l, ConvLayer)]
    qh = quantize_from_batches(params, spec, batches,
                               int8_layers=conv_ids[1:])
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    x8 = quantize_canvas(x, qh["__net__"]["input_scale"])
    yf = np.asarray(forward_quantized(qh, x, spec))
    y8 = np.asarray(forward_quantized(qh, x8, spec))
    # int8 input adds one quantization of the canvas (step 1/127): small
    # relative to the head's dynamic range on this random net
    assert np.max(np.abs(yf - y8)) < 0.15 * max(1.0, np.max(np.abs(yf)))


def test_int8_input_requires_quantized_forward():
    from modelcompression_tpu.evaluation import EvalConfig

    import pytest
    with pytest.raises(ValueError, match="int8_input"):
        EvalConfig(int8_input=True)


# ----------------------------------------------------- YOLOv3-family specs


def _v3_setup(seed=0, n_batches=2):
    from modelcompression_tpu.data.fixtures import tiny_yolo3_cfg
    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    params = fold_batchnorm(init_params(spec, jax.random.key(seed)), spec)
    rng = np.random.default_rng(seed + 1)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
               for _ in range(n_batches)]
    return spec, params, batches


def test_v3_scale_groups():
    """Shortcut output is its own scale group (float boundary); upsample
    and [yolo] pass their input's group through; the fine-path route
    merges the upsample group with the shortcut tap it concats."""
    from modelcompression_tpu.compress.quantize import _scale_groups
    from modelcompression_tpu.data.fixtures import tiny_yolo3_cfg
    spec = parse_cfg(tiny_yolo3_cfg(num_classes=3))
    g = _scale_groups(spec)
    assert g[6] != g[5]            # shortcut: new grid, not prev's
    assert g[6] != g[3]            # ... and not the residual tap's
    assert g[10] == g[9]           # [yolo] head passes through
    assert g[13] == g[12]          # upsample preserves conv12's grid
    assert g[14] == g[13] == g[6]  # route(upsample, shortcut) merges both


def test_v3_head_convs_skip_out_requant():
    spec, params, batches = _v3_setup()
    q = quantize_from_batches(params, spec, batches)
    for i in (9, 16):  # head producers (compress/graph.py)
        assert "out_scale" not in q[f"conv{i}"]
        assert "w_q" in q[f"conv{i}"]  # still int8 weights
    for i in (0, 2, 4, 5, 7, 8, 12, 15):
        assert "out_scale" in q[f"conv{i}"]


def test_v3_quantized_forward_close_to_f32():
    """Full-int8 fixture v3 (through shortcut add, upsample, route concat
    and two heads): every scale's raw map tracks f32 within PTQ error."""
    from modelcompression_tpu.core import BITMATCH
    from modelcompression_tpu.models.darknet import forward_folded

    spec, params, batches = _v3_setup()
    q = quantize_from_batches(params, spec, batches)
    x = jnp.asarray(batches[0])
    refs = forward_folded(params, x, spec, BITMATCH)
    gots = forward_quantized(q, x, spec)
    assert isinstance(gots, tuple) and len(gots) == 2
    for got, ref in zip(map(np.asarray, gots), map(np.asarray, refs)):
        assert got.shape == ref.shape
        nrmse = np.sqrt(np.mean((got - ref) ** 2)) / (np.std(ref) + 1e-9)
        assert nrmse < 0.15, nrmse


def test_v3_hybrid_island_across_shortcut():
    """An int8 island spanning the residual block (convs 4,5 + the
    shortcut consumer 7) dequantizes at the add and requantizes at the
    consumer — mixed subsets stay numerically sane."""
    from modelcompression_tpu.core import BITMATCH
    from modelcompression_tpu.models.darknet import forward_folded

    spec, params, batches = _v3_setup(seed=2)
    x = jnp.asarray(batches[0])
    refs = forward_folded(params, x, spec, BITMATCH)
    for sel in ([4, 5, 7], [0, 2], [15, 16]):
        q = quantize_from_batches(params, spec, batches, int8_layers=sel)
        gots = forward_quantized(q, x, spec)
        for got, ref in zip(map(np.asarray, gots), map(np.asarray, refs)):
            nrmse = np.sqrt(np.mean((got - ref) ** 2)) / (np.std(ref) + 1e-9)
            assert nrmse < 0.15, (sel, nrmse)


def test_v3_upsample_commutes_with_quantization():
    """upsample(round(x/s)) == round(upsample(x)/s): nearest-neighbor
    replication commutes with a positive per-tensor scale, so int8 flows
    straight through (the _scale_groups union rule)."""
    from modelcompression_tpu.models.darknet import upsample_nearest
    rng = np.random.default_rng(3)
    x = rng.uniform(-3, 3, (1, 6, 6, 4)).astype(np.float32)
    s = 3.0 / 127.0
    q = jnp.clip(jnp.round(jnp.asarray(x) / s), -127, 127).astype(jnp.int8)
    up_then_q = jnp.clip(jnp.round(upsample_nearest(jnp.asarray(x), 2) / s),
                         -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(upsample_nearest(q, 2)),
                                  np.asarray(up_then_q))


def test_v3_qmodel_roundtrip(tmp_path):
    from modelcompression_tpu.compress import load_qmodel, save_qmodel

    spec, params, batches = _v3_setup(seed=4, n_batches=1)
    q = quantize_from_batches(params, spec, batches)
    path = str(tmp_path / "v3.qz")
    save_qmodel(path, q, spec)
    q2, spec2 = load_qmodel(path)
    assert len(spec2.layers) == len(spec.layers)
    x = jnp.asarray(batches[0])
    for a, b in zip(forward_quantized(q, x, spec),
                    forward_quantized(q2, x, spec2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v3_qat_spec_head_rule():
    """QAT grids mirror deployment: head producers get in_scale but no
    out_scale, everything else gets both."""
    from modelcompression_tpu.compress.qat import qat_spec_from_batches

    spec, params, batches = _v3_setup(seed=5, n_batches=1)
    # qat calibrates from UNfolded params (it folds internally)
    raw_params = init_params(spec, jax.random.key(5))
    qat = qat_spec_from_batches(raw_params, spec, batches)
    assert set(qat.in_scale) == set(spec.conv_indices())
    assert 9 not in qat.out_scale and 16 not in qat.out_scale
    assert set(qat.out_scale) == set(spec.conv_indices()) - {9, 16}


def test_eval_pipeline_int8_v3_smoke(tmp_path):
    """The fused eval program on a quantized MULTI-HEAD net: letterbox ->
    int8 v3 forward (tuple of raw maps) -> decode_heads -> NMS -> AP."""
    from modelcompression_tpu.data.fixtures import (
        FIXTURE_CLASSES, make_fake_voc, tiny_yolo3_cfg,
    )
    from modelcompression_tpu.data.voc import (
        load_list_dataset, read_data_cfg,
    )
    from modelcompression_tpu.evaluation import EvalConfig, evaluate

    spec, params, batches = _v3_setup(seed=6, n_batches=1)
    data_cfg = make_fake_voc(str(tmp_path), n_images=4, image_size=96,
                             seed=7)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    q = quantize_from_batches(params, spec, batches)
    cfg = EvalConfig(batch_size=2, max_detections=10,
                     forward_fn=lambda p, x, s: forward_quantized(p, x, s))
    res = evaluate(q, spec, samples, FIXTURE_CLASSES, cfg)
    assert res.n_images == 4
    assert 0.0 <= res.map50 <= 1.0
