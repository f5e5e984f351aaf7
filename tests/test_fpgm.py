"""FPGM structured criterion (He et al. 2019, geometric-median filter
pruning — compress/criteria.fpgm_scores_device, prune --mode fpgm)."""

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.compress import (
    channel_masks_from_keep, fpgm_scores_device, repack,
    uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.core import FAST
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import forward, init_params, parse_cfg
from modelcompression_tpu.models.darknet import conv_key


def _spec():
    return parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))


def _oracle(w_hwio):
    """Distance-sum oracle: score_j = sum_i ||F_j - F_i||_2, float64."""
    x = np.asarray(w_hwio, np.float64).reshape(-1, w_hwio.shape[-1]).T
    d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    return d.sum(1)


def test_fpgm_scores_match_numpy_oracle():
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    scores = fpgm_scores_device(params, spec)
    conv_idx = spec.conv_indices()
    assert conv_idx[-1] not in scores  # detection conv protected
    for i, s in scores.items():
        ref = _oracle(params[conv_key(i)]["w"])
        np.testing.assert_allclose(s, ref, rtol=2e-4)


def test_fpgm_prunes_filters_nearest_the_median():
    """A redundant cluster of near-identical filters sits at the layer's
    geometric median; FPGM must prune from the cluster, never the
    outliers — the paper's core claim vs norm-based ranking."""
    spec = _spec()
    params = init_params(spec, jax.random.key(1))
    i0 = spec.conv_indices()[0]
    w = np.array(params[conv_key(i0)]["w"], np.float32)
    o = w.shape[-1]
    rng = np.random.default_rng(0)
    base = rng.normal(size=w.shape[:-1] + (1,)).astype(np.float32)
    outliers = list(range(0, o, 4))  # every 4th filter is far away
    for j in range(o):
        if j in outliers:
            w[..., j] = 10.0 * rng.normal(size=w.shape[:-1])
        else:
            w[..., j] = base[..., 0] + 0.01 * rng.normal(size=w.shape[:-1])
    params[conv_key(i0)]["w"] = jnp.asarray(w)
    n_drop = o // 4
    keep = uniform_filter_fraction_keep_sets(spec, params, n_drop / o,
                                             criterion="fpgm")
    kept = set(keep[i0].tolist())
    assert set(outliers) <= kept  # all outliers survive
    # note the outliers ALSO have the largest L1 norms here, so check the
    # discriminating direction too: give one cluster member a huge norm
    # but keep it inside the cluster direction — FPGM still prunes by
    # geometry, not by magnitude
    w2 = w.copy()
    w2[..., 1] = 50.0 * base[..., 0]  # colinear with the cluster = redundant
    params[conv_key(i0)]["w"] = jnp.asarray(w2)
    scores = fpgm_scores_device(params, spec)[i0]
    # filter 1 is far from everything in Euclidean terms (big norm), so
    # its distance-sum is LARGE; the small cluster members stay smallest
    cluster = [j for j in range(o) if j not in outliers and j != 1]
    assert scores[1] > max(scores[j] for j in cluster)


def test_fpgm_repack_matches_masked_forward():
    spec = _spec()
    params = init_params(spec, jax.random.key(2))
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.5,
                                             criterion="fpgm")
    slim_spec, slim_params = repack(spec, params, keep)
    masks = channel_masks_from_keep(spec, keep)
    x = jax.random.uniform(jax.random.key(3), (2, 64, 64, 3))
    y_slim = forward(slim_params, x, slim_spec, FAST)
    y_mask = forward(params, x, spec, FAST, channel_masks=masks)
    np.testing.assert_allclose(np.asarray(y_slim), np.asarray(y_mask),
                               atol=1e-5)


def test_fpgm_prune_cli(tmp_path):
    from modelcompression_tpu.cli import prune
    from modelcompression_tpu.models import load_cfg, load_weights
    from modelcompression_tpu.models.cfg import ConvLayer
    from modelcompression_tpu.models import save_weights
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    cfg_path = str(tmp_path / "net.cfg")
    from modelcompression_tpu.models import dump_cfg
    open(cfg_path, "w").write(dump_cfg(spec))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)

    out = str(tmp_path / "slim.weights")
    out_cfg = str(tmp_path / "slim.cfg")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "fpgm", "--fraction", "0.5",
                     "--out", out, "--out-cfg", out_cfg])
    assert rc == 0
    slim = load_cfg(out_cfg)
    slim_params, _ = load_weights(out, slim)
    convs = [l for l in slim.layers if isinstance(l, ConvLayer)]
    orig = [l for l in spec.layers if isinstance(l, ConvLayer)]
    assert convs[0].filters == orig[0].filters // 2
    assert convs[-1].filters == orig[-1].filters  # detection conv intact
