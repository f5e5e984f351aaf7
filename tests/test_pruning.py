"""Pruning-math property tests (SURVEY.md §4.2): exact zero counts, top-k
preservation, global threshold correctness, L1 ranking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from modelcompression_tpu.compress import (
    apply_masks, global_threshold, l1_filter_keep, magnitude_mask_layer,
    magnitude_masks_global, magnitude_masks_perlayer, mask_sparsity,
)
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.models.darknet import conv_key
from modelcompression_tpu.data.fixtures import tiny_region_cfg


@st.composite
def weight_arrays(draw):
    shape = draw(st.sampled_from([(3, 3, 4, 8), (1, 1, 16, 8), (3, 3, 2, 2)]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@given(weight_arrays(), st.floats(0.0, 0.99))
@settings(max_examples=30, deadline=None)
def test_perlayer_exact_zero_count_and_topk(w, sparsity):
    mask = np.asarray(magnitude_mask_layer(jnp.asarray(w), sparsity))
    n = w.size
    n_zero = int(sparsity * n)
    assert (~mask).sum() == n_zero
    # kept entries are exactly the top-(n - n_zero) by |w| (rank w/ ties)
    flat = np.abs(w).reshape(-1)
    order = np.argsort(flat, kind="stable")
    expected = np.ones(n, bool)
    expected[order[:n_zero]] = False
    np.testing.assert_array_equal(mask.reshape(-1), expected)


@given(st.integers(0, 2**31 - 1), st.floats(0.05, 0.95))
@settings(max_examples=10, deadline=None)
def test_global_mask_hits_target_within_one(seed, sparsity):
    spec = parse_cfg(tiny_region_cfg(num_classes=2, width=64, height=64))
    params = init_params(spec, jax.random.key(seed % 1000))
    masks = magnitude_masks_global(params, spec, sparsity)
    total = sum(m.size for m in masks.values())
    zeros = sum(int((~np.asarray(m)).sum()) for m in masks.values())
    assert zeros == int(sparsity * total)
    # global property: every pruned |w| <= every kept |w|
    pruned_max = max(
        (float(np.abs(np.asarray(params[k]["w"]))[~np.asarray(m)].max())
         for k, m in masks.items() if (~np.asarray(m)).any()),
        default=-np.inf)
    kept_min = min(
        (float(np.abs(np.asarray(params[k]["w"]))[np.asarray(m)].min())
         for k, m in masks.items() if np.asarray(m).any()),
        default=np.inf)
    assert pruned_max <= kept_min


def test_global_differs_from_perlayer():
    """Layers with systematically bigger weights keep more under global."""
    spec = parse_cfg(tiny_region_cfg(num_classes=2, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    # inflate one layer's weights 10x
    k0 = conv_key(spec.conv_indices()[0])
    params[k0] = dict(params[k0], w=params[k0]["w"] * 10.0)
    g = magnitude_masks_global(params, spec, 0.5)
    p = magnitude_masks_perlayer(params, spec, 0.5)
    g_kept = int(np.asarray(g[k0]).sum())
    p_kept = int(np.asarray(p[k0]).sum())
    assert g_kept > p_kept


def test_global_threshold_value():
    spec = parse_cfg(tiny_region_cfg(num_classes=2, width=64, height=64))
    params = init_params(spec, jax.random.key(1))
    tau = float(global_threshold(params, spec, 0.75))
    masks = magnitude_masks_global(params, spec, 0.75)
    for k, m in masks.items():
        absw = np.abs(np.asarray(params[k]["w"]))
        m = np.asarray(m)
        if (~m).any():
            assert absw[~m].max() <= tau + 1e-7


def test_l1_keep_semantics():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 3, 4, 10)).astype(np.float32)
    keep = np.asarray(l1_filter_keep(jnp.asarray(w), 0.3))
    assert keep.shape == (7,)
    scores = np.abs(w).sum((0, 1, 2))
    dropped = sorted(set(range(10)) - set(keep.tolist()))
    assert max(scores[dropped]) <= min(scores[keep])
    assert (np.sort(keep) == keep).all()


def test_apply_masks_and_sparsity():
    spec = parse_cfg(tiny_region_cfg(num_classes=2, width=64, height=64))
    params = init_params(spec, jax.random.key(2))
    masks = magnitude_masks_perlayer(params, spec, 0.75)
    s = float(mask_sparsity(masks))
    total = sum(m.size for m in masks.values())
    assert abs(s - 0.75) < len(masks) / total * 2 + 1e-6
    pruned = apply_masks(params, masks)
    for k, m in masks.items():
        w = np.asarray(pruned[k]["w"])
        assert (w[~np.asarray(m)] == 0).all()
        # kept weights unchanged
        np.testing.assert_array_equal(
            w[np.asarray(m)], np.asarray(params[k]["w"])[np.asarray(m)])
    # BN params untouched
    k0 = conv_key(spec.conv_indices()[0])
    np.testing.assert_array_equal(pruned[k0]["gamma"], params[k0]["gamma"])
