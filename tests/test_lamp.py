"""LAMP unstructured criterion (Lee et al. 2021, layer-adaptive
magnitude pruning — compress/lamp.py, prune --mode lamp)."""

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.compress import (
    lamp_layer_sparsities, lamp_masks, lamp_scores_device,
    magnitude_masks_global, mask_sparsity,
)
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.models.darknet import conv_key


def _spec():
    return parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))


def _oracle_scores(w):
    flat = (np.asarray(w, np.float64) ** 2).ravel()
    order = np.argsort(flat, kind="stable")
    srt = flat[order]
    suffix = np.cumsum(srt[::-1])[::-1]
    out = np.empty_like(flat)
    out[order] = srt / suffix
    return out.reshape(np.shape(w))


def test_lamp_scores_match_numpy_oracle():
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    scores = lamp_scores_device(params, spec)
    for k, s in scores.items():
        ref = _oracle_scores(params[k]["w"])
        np.testing.assert_allclose(np.asarray(s, np.float64), ref,
                                   rtol=5e-4)
        assert float(np.max(np.asarray(s))) <= 1.0 + 1e-6


def test_lamp_mask_exact_zero_count_and_nesting():
    spec = _spec()
    params = init_params(spec, jax.random.key(1))
    n_total = sum(params[conv_key(i)]["w"].size
                  for i in spec.conv_indices())
    prev_zeros = None
    for s in (0.25, 0.5, 0.9):
        masks = lamp_masks(params, spec, s)
        zeros = {k: ~np.asarray(m) for k, m in masks.items()}
        n_zero = sum(int(z.sum()) for z in zeros.values())
        assert n_zero == int(s * n_total)
        if prev_zeros is not None:  # masks nest: zeros only grow
            for k in zeros:
                assert np.all(zeros[k] >= prev_zeros[k])
        prev_zeros = zeros


def test_lamp_is_scale_invariant_unlike_global_magnitude():
    """Scale one layer down 100x: plain global magnitude wipes it out;
    LAMP's within-layer-relative scores don't move at all (the paper's
    layer-adaptive property)."""
    spec = _spec()
    params = init_params(spec, jax.random.key(2))
    conv_idx = spec.conv_indices()
    k_small = conv_key(conv_idx[1])
    base = lamp_masks(params, spec, 0.5)
    params[k_small]["w"] = params[k_small]["w"] * 0.01

    mag = magnitude_masks_global(params, spec, 0.5)
    lamp = lamp_masks(params, spec, 0.5)
    mag_sp = float(np.mean(~np.asarray(mag[k_small])))
    lamp_sp = float(np.mean(~np.asarray(lamp[k_small])))
    assert mag_sp > 0.95           # global |w| starves the scaled layer
    assert lamp_sp < 0.9           # LAMP keeps it in the allocation
    # exact invariance: scaling a whole layer changes nothing in LAMP
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(lamp[k]))


def test_lamp_layer_maxima_survive_extreme_sparsity():
    """Each layer's largest weight scores exactly 1.0, so no layer is
    emptied before every other layer is down to its own maximum."""
    spec = _spec()
    params = init_params(spec, jax.random.key(3))
    masks = lamp_masks(params, spec, 0.99)
    for k, m in masks.items():
        w = np.abs(np.asarray(params[k]["w"]))
        kept = np.asarray(m)
        assert kept.any()
        assert kept.ravel()[int(np.argmax(w.ravel()))]
    sp = lamp_layer_sparsities(masks)
    assert all(v < 1.0 for v in sp.values())
    assert abs(float(mask_sparsity(masks)) - 0.99) < 0.001


def test_lamp_prune_cli(tmp_path):
    from modelcompression_tpu.cli import prune
    from modelcompression_tpu.models import (
        dump_cfg, load_weights, save_weights,
    )
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    out = str(tmp_path / "lamp.weights")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "lamp", "--sparsity", "0.5", "--out", out])
    assert rc == 0
    pruned, _ = load_weights(out, spec)
    zeros = sum(float((np.asarray(p["w"]) == 0).sum())
                for p in pruned.values())
    total = sum(np.asarray(p["w"]).size for p in pruned.values())
    assert abs(zeros / total - 0.5) < 0.01
