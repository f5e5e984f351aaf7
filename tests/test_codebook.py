"""Weight sharing via k-means codebooks (compress/codebook.py): exactness
properties, pruning composition, artifact roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.compress import apply_masks, magnitude_masks_perlayer
from modelcompression_tpu.compress.codebook import (
    cluster_layer, cluster_network, load_cmodel, reconstruct, save_cmodel,
)
from modelcompression_tpu.core import FAST
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import forward, init_params, parse_cfg


def _spec():
    return parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))


def test_cluster_layer_basic_properties():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 3, 16, 32)).astype(np.float32)
    codes, cb = cluster_layer(w, bits=4)
    assert cb.size <= 16 and codes.shape == w.shape
    rec = cb[codes.astype(np.int64)]
    assert np.unique(rec).size <= 16
    # shared values approximate the originals (coarse bound: well under
    # the weight range)
    assert np.abs(rec - w).max() < (w.max() - w.min()) / 4


def test_cluster_layer_exact_when_few_distinct():
    # a tensor with <= 2^bits distinct values round-trips EXACTLY
    vals = np.float32([-1.5, -0.25, 0.75, 2.0])
    w = vals[np.random.default_rng(1).integers(0, 4, size=(5, 5, 4, 8))]
    codes, cb = cluster_layer(w, bits=2)
    np.testing.assert_array_equal(cb[codes.astype(np.int64)], w)


def test_cluster_preserves_pruned_zeros_exactly():
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    masks = magnitude_masks_perlayer(params, spec, 0.5)
    pruned = apply_masks(params, masks)
    cmodel = cluster_network(jax.tree.map(np.asarray, pruned), spec, bits=4)
    rec = reconstruct(cmodel)
    for k, p in pruned.items():
        w0 = np.asarray(p["w"])
        w1 = np.asarray(rec[k]["w"])
        # every pruned zero is still exactly zero, and no new zeros appear
        np.testing.assert_array_equal(w1 == 0.0, w0 == 0.0)


def test_cmodel_roundtrip_and_size(tmp_path):
    from modelcompression_tpu.models import save_weights
    spec = _spec()
    params = jax.tree.map(np.asarray, init_params(spec, jax.random.key(2)))
    cmodel = cluster_network(params, spec, bits=6)
    path = str(tmp_path / "m.cz")
    save_cmodel(path, cmodel, spec)
    rec, spec2 = load_cmodel(path)
    direct = reconstruct(cmodel)
    for k in direct:
        for f in direct[k]:
            np.testing.assert_array_equal(np.asarray(rec[k][f]),
                                          np.asarray(direct[k][f]))
    # the artifact beats the f32 .weights on disk
    wpath = str(tmp_path / "m.weights")
    save_weights(wpath, spec, params, seen=0)
    assert os.path.getsize(path) < os.path.getsize(wpath) / 2.5

    # architecture guard
    other = parse_cfg(tiny_region_cfg(num_classes=4, width=64, height=64))
    with pytest.raises(ValueError, match="architecture"):
        load_cmodel(path, spec=other)


def test_clustered_forward_stays_close():
    spec = _spec()
    params = init_params(spec, jax.random.key(3))
    x = jax.random.uniform(jax.random.key(4), (2, 64, 64, 3))
    y0 = np.asarray(forward(params, x, spec, FAST), np.float32)
    rec = reconstruct(cluster_network(
        jax.tree.map(np.asarray, params), spec, bits=8))
    y1 = np.asarray(forward(rec, x, spec, FAST), np.float32)
    # 8-bit shared weights: raw map within a small fraction of its range
    span = y0.max() - y0.min()
    assert np.abs(y1 - y0).max() < 0.05 * span
