"""Low-rank SVD factorization (compress/lowrank.py): full-rank
exactness, Eckart-Young truncation, route/reorg index remapping on the
full YOLOv2 graph, cost guard, cfg/weights round-trip, CLI."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.compress.lowrank import (
    breakeven_rank, factor_conv_weight, factor_network, rank_for_energy,
)
from modelcompression_tpu.core import BITMATCH
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import (
    forward, init_params, num_params, parse_cfg, yolov2_voc,
)
from modelcompression_tpu.models.cfg import ConvLayer, RouteLayer, dump_cfg
from modelcompression_tpu.models.darknet import conv_key


def _small_yolov2():
    spec = yolov2_voc()
    spec.net.width = spec.net.height = 96
    return spec


def test_factor_conv_weight_full_rank_exact():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
    w1, w2 = factor_conv_weight(w, rank=16)
    rec = np.einsum("hwir,xyro->hwio", w1, w2[0, 0][None, None])
    np.testing.assert_allclose(rec, w, atol=1e-5)


def test_factor_conv_weight_truncation_is_eckart_young():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(1, 1, 32, 32)).astype(np.float32)
    m = w.reshape(32, 32).astype(np.float64)
    s = np.linalg.svd(m, compute_uv=False)
    for r in (1, 8, 31):
        w1, w2 = factor_conv_weight(w, rank=r)
        rec = (w1.reshape(32, r).astype(np.float64)
               @ w2.reshape(r, 32).astype(np.float64))
        err = np.linalg.norm(m - rec)
        np.testing.assert_allclose(err, np.sqrt((s[r:] ** 2).sum()),
                                   rtol=1e-6)


def test_rank_for_energy_monotone_and_bounds():
    s = np.array([4.0, 2.0, 1.0, 0.5, 0.0])
    # energy 1.0 excludes the exactly-zero tail of the spectrum
    assert rank_for_energy(s, 1.0) == 4
    ranks = [rank_for_energy(s, e) for e in (0.5, 0.8, 0.95, 0.999)]
    assert ranks == sorted(ranks)
    assert rank_for_energy(s, 1e-9) == 1
    with pytest.raises(ValueError):
        rank_for_energy(s, 0.0)


def test_breakeven_guard_keeps_costly_layers():
    # random weights have near-flat spectra: at energy=1.0 the selected
    # rank is full, which always fails the cost guard -> nothing factored
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    spec2, params2, report = factor_network(
        jax.tree.map(np.asarray, params), spec, energy=1.0, max_cost=1.0)
    assert report == []
    assert len(spec2.layers) == len(spec.layers)
    assert num_params(params2) == num_params(params)


def test_explicit_ranks_factor_and_forward_matches_truncation():
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    cidx = spec.conv_indices()[1]
    layer = spec.layers[cidx]
    full = min(layer.size * layer.size * layer.in_channels, layer.filters)
    spec2, params2, report = factor_network(
        jax.tree.map(np.asarray, params), spec,
        ranks={cidx: full}, energy=1e-6, max_cost=10.0)
    assert any(e.layer_idx == cidx and e.rank == full for e in report)
    # full-rank factoring preserves the network function
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, 64, 64, 3)).astype(np.float32))
    y0 = forward(params, x, spec, BITMATCH)
    y1 = forward(params2, x, spec2, BITMATCH)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=5e-4, rtol=1e-3)


def test_factored_layer_structure():
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    cidx = spec.conv_indices()[2]
    orig = spec.layers[cidx]
    spec2, params2, _ = factor_network(
        jax.tree.map(np.asarray, params), spec, ranks={cidx: 2},
        energy=1e-6, max_cost=10.0)
    first, second = spec2.layers[cidx], spec2.layers[cidx + 1]
    assert isinstance(first, ConvLayer) and isinstance(second, ConvLayer)
    assert (first.filters, first.size, first.stride) == (2, orig.size,
                                                         orig.stride)
    assert (first.activation, first.batch_normalize) == ("linear", False)
    assert (second.filters, second.size, second.pad) == (orig.filters, 1,
                                                         0)
    assert second.activation == orig.activation
    assert second.batch_normalize == orig.batch_normalize
    k1 = params2[conv_key(cidx)]
    assert k1["w"].shape == (orig.size, orig.size, orig.in_channels, 2)
    assert np.all(np.asarray(k1["bias"]) == 0.0)


def test_full_yolov2_route_reorg_remap_full_rank():
    """Factor convs BEFORE the route/reorg head at full rank on the real
    YOLOv2 graph: route references must be remapped and the network
    function preserved — the index-surgery correctness trap."""
    spec = _small_yolov2()
    params = init_params(spec, jax.random.key(0))
    np_params = jax.tree.map(np.asarray, params)
    # explicitly factor two 1x1 convs that sit before route targets
    routes = [l for l in spec.layers if isinstance(l, RouteLayer)]
    assert routes, "yolov2 cfg must contain routes"
    c1x1 = [i for i in spec.conv_indices()
            if spec.layers[i].size == 1][:2]
    ranks = {}
    for i in c1x1:
        l = spec.layers[i]
        ranks[i] = min(l.size * l.size * l.in_channels, l.filters)
    spec2, params2, report = factor_network(
        np_params, spec, ranks=ranks, energy=1e-6, max_cost=100.0)
    assert len(report) == len(c1x1)
    assert len(spec2.layers) == len(spec.layers) + len(c1x1)
    # route targets still reference the same-channel producers
    from modelcompression_tpu.models import out_channels
    assert out_channels(spec2)[-1] == out_channels(spec)[-1]
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, 96, 96, 3)).astype(np.float32))
    y0 = forward(params, x, spec, BITMATCH)
    y1 = forward(params2, x, spec2, BITMATCH)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=5e-3, rtol=1e-2)


def test_factored_cfg_weights_roundtrip(tmp_path):
    from modelcompression_tpu.models import load_weights, save_weights
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    spec2, params2, _ = factor_network(
        jax.tree.map(np.asarray, params), spec,
        ranks={spec.conv_indices()[1]: 3}, energy=1e-6, max_cost=10.0)
    cfg2 = tmp_path / "fac.cfg"
    cfg2.write_text(dump_cfg(spec2))
    respec = parse_cfg(cfg2.read_text())
    assert [type(l) for l in respec.layers] == \
        [type(l) for l in spec2.layers]
    w2 = tmp_path / "fac.weights"
    save_weights(str(w2), spec2, params2, seen=7)
    loaded, seen = load_weights(str(w2), respec)
    assert seen == 7
    for k in params2:
        np.testing.assert_array_equal(np.asarray(loaded[k]["w"]),
                                      np.asarray(params2[k]["w"]))


def test_prune_cli_lowrank(tmp_path):
    from modelcompression_tpu.cli import prune as prune_cli
    from modelcompression_tpu.data.fixtures import make_fake_voc
    from modelcompression_tpu.models import save_weights

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    cfg_path = tmp_path / "net.cfg"
    cfg_path.write_text(tiny_region_cfg(num_classes=3, width=64,
                                        height=64))
    wpath = tmp_path / "w.weights"
    save_weights(str(wpath), spec,
                 jax.tree.map(np.asarray, params), seen=0)
    out_w, out_cfg = tmp_path / "fac.weights", tmp_path / "fac.cfg"
    cidx = spec.conv_indices()[1]
    rc = prune_cli.main([
        "--cfg", str(cfg_path), "--weights", str(wpath),
        "--mode", "lowrank", "--rank", f"{cidx}:2", "--energy", "0.0001",
        "--out", str(out_w), "--out-cfg", str(out_cfg)])
    assert rc == 0 and out_w.exists() and out_cfg.exists()
    # the factored model is a plain cfg: eval consumes it directly
    from modelcompression_tpu.cli import eval as eval_cli
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=2,
                             image_size=96, seed=5)
    rc = eval_cli.main(["--cfg", str(out_cfg), "--weights", str(out_w),
                        "--data", data_cfg, "--batch", "2"])
    assert rc == 0
    # bad rank index fails loudly
    assert prune_cli.main([
        "--cfg", str(cfg_path), "--weights", str(wpath),
        "--mode", "lowrank", "--rank", "999:2",
        "--out", str(out_w)]) == 2


def test_lowrank_composes_with_repack_and_int8():
    """The factored model is a plain spec, so the OTHER axes must
    consume it unchanged: uniform L1 repack slims it (keep-set walk
    through the inserted 1x1), and int8 PTQ quantizes it (generic conv
    walk) — both forwards stay finite and correctly shaped."""
    import numpy as np

    from modelcompression_tpu.compress import (
        factor_network, quantize_from_batches, forward_quantized, repack,
        uniform_filter_fraction_keep_sets,
    )
    from modelcompression_tpu.models import num_params
    from modelcompression_tpu.models.darknet import fold_batchnorm

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(6))
    cidx = spec.conv_indices()[2]
    fac_spec, fac_params, rep = factor_network(
        jax.tree.map(np.asarray, params), spec, ranks={cidx: 4},
        max_cost=10.0)
    assert len(rep) == 1

    # structured repack ON the factored spec
    keep = uniform_filter_fraction_keep_sets(fac_spec, fac_params, 0.5)
    slim_spec, slim_params = repack(fac_spec, fac_params, keep)
    assert num_params(slim_params) < num_params(fac_params)
    x = jnp.asarray(np.random.default_rng(7).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    y = forward(slim_params, x, slim_spec, BITMATCH)
    assert np.isfinite(np.asarray(y)).all()

    # int8 PTQ ON the factored spec
    folded = fold_batchnorm(fac_params, fac_spec)
    q = quantize_from_batches(folded, fac_spec,
                              [np.asarray(x, np.float32)])
    yq = forward_quantized(q, x, fac_spec)
    assert np.asarray(yq).shape == np.asarray(
        forward(fac_params, x, fac_spec, BITMATCH)).shape
    assert np.isfinite(np.asarray(yq)).all()
