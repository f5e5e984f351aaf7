"""Fused top-k/mask op tests (SURVEY.md §7.2.3): the bisection-based XLA
implementation and the Pallas kernels must be drop-in equal to the
sort-based reference criteria."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.compress import (
    magnitude_masks_global as ref_global,
    magnitude_masks_perlayer as ref_perlayer,
)
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.models.darknet import conv_key
from modelcompression_tpu.ops import (
    magnitude_masks_global, magnitude_masks_perlayer,
    pallas_magnitude_prune, segmented_kth_bits, abs_bits,
)


@pytest.fixture(scope="module")
def setup():
    spec = parse_cfg(tiny_region_cfg(num_classes=2, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    return spec, params


def test_kth_bits_matches_sort():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(5000).astype(np.float32))
    bits = abs_bits(x)
    seg = jnp.zeros((5000,), jnp.int32)
    for k in (0, 1, 17, 2499, 4999):
        got = int(segmented_kth_bits(bits, seg, jnp.asarray([k]), 1)[0])
        want = int(np.sort(np.asarray(bits))[k])
        assert got == want, (k, got, want)


@pytest.mark.parametrize("sparsity", [0.0, 0.1, 0.5, 0.75, 0.9])
def test_bisect_perlayer_equals_sort_reference(setup, sparsity):
    spec, params = setup
    ref = ref_perlayer(params, spec, sparsity)
    got = magnitude_masks_perlayer(params, spec, sparsity)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]), err_msg=k)


@pytest.mark.parametrize("sparsity", [0.1, 0.75])
def test_bisect_global_equals_sort_reference(setup, sparsity):
    spec, params = setup
    ref = ref_global(params, spec, sparsity)
    got = magnitude_masks_global(params, spec, sparsity)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]), err_msg=k)


def test_bisect_handles_ties():
    """Duplicate |w| values at the cut: earliest-index pruned first, exact
    zero count preserved (the stable-rank contract)."""
    cfg = tiny_region_cfg(num_classes=2, width=64, height=64)
    spec = parse_cfg(cfg)
    params = init_params(spec, jax.random.key(1))
    # force massive ties: quantize a layer's weights to 3 levels
    k0 = conv_key(spec.conv_indices()[1])
    w = np.asarray(params[k0]["w"])
    params[k0] = dict(params[k0], w=jnp.asarray(
        np.sign(w) * np.round(np.abs(w) * 2) / 2).astype(jnp.float32))
    for sparsity in (0.3, 0.5):
        ref = ref_perlayer(params, spec, sparsity)
        got = magnitude_masks_perlayer(params, spec, sparsity)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(ref[k]), err_msg=k)


@pytest.mark.parametrize("per_layer", [True, False])
@pytest.mark.parametrize("sparsity", [0.25, 0.75])
def test_pallas_prune_matches_reference(setup, per_layer, sparsity):
    """Pallas kernels (interpret mode on CPU) == sort-based reference
    applied masks."""
    spec, params = setup
    ref_masks = (ref_perlayer if per_layer else ref_global)(
        params, spec, sparsity)
    pruned = pallas_magnitude_prune(params, spec, sparsity,
                                    per_layer=per_layer)
    for k, m in ref_masks.items():
        want = np.asarray(params[k]["w"]) * np.asarray(m)
        np.testing.assert_array_equal(np.asarray(pruned[k]["w"]), want,
                                      err_msg=k)
    # non-w entries untouched
    k0 = next(iter(ref_masks))
    np.testing.assert_array_equal(np.asarray(pruned[k0]["gamma"]),
                                  np.asarray(params[k0]["gamma"]))


def test_pallas_zero_sparsity_noop(setup):
    spec, params = setup
    pruned = pallas_magnitude_prune(params, spec, 0.0)
    for k in pruned:
        np.testing.assert_array_equal(np.asarray(pruned[k]["w"]),
                                      np.asarray(params[k]["w"]))
