"""Network slimming (Liu et al. 2017): BN-gamma structured criterion +
gamma-L1 sparsity training (compress/criteria.bn_gamma_scores_device,
TrainConfig.bn_l1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.compress import (
    bn_gamma_scores_device, filter_scores_device, repack,
    uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.core import FAST
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import forward, init_params, parse_cfg
from modelcompression_tpu.models.darknet import conv_key
from modelcompression_tpu.train import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)


def _spec():
    return parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))


def test_bn_gamma_scores_are_abs_gamma():
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    conv_idx = spec.conv_indices()
    i0 = conv_idx[0]
    g = np.linspace(-2.0, 2.0, params[conv_key(i0)]["gamma"].size,
                    dtype=np.float32)
    params[conv_key(i0)]["gamma"] = jnp.asarray(g)
    scores = bn_gamma_scores_device(params, spec)
    assert conv_idx[-1] not in scores  # detection conv protected
    np.testing.assert_allclose(scores[i0], np.abs(g), rtol=1e-6)


def test_bn_gamma_keep_sets_drop_smallest_gamma():
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    i0 = spec.conv_indices()[0]
    n = params[conv_key(i0)]["gamma"].size
    g = np.ones(n, np.float32)
    dropped = [1, 5, 7, 11]
    g[dropped] = 0.01
    params[conv_key(i0)]["gamma"] = jnp.asarray(g)
    keep = uniform_filter_fraction_keep_sets(spec, params, 4 / n,
                                             criterion="bn_gamma")
    assert set(range(n)) - set(keep[i0].tolist()) == set(dropped)


def test_bn_gamma_repack_matches_masked_forward():
    # the slimming pipeline rides the SAME repack machinery: slimmed
    # forward == channel-masked forward, exactly
    from modelcompression_tpu.compress import channel_masks_from_keep
    spec = _spec()
    params = init_params(spec, jax.random.key(1))
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.5,
                                             criterion="bn_gamma")
    slim_spec, slim_params = repack(spec, params, keep)
    masks = channel_masks_from_keep(spec, keep)
    x = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    y_slim = forward(slim_params, x, slim_spec, FAST)
    y_mask = forward(params, x, spec, FAST, channel_masks=masks)
    np.testing.assert_allclose(np.asarray(y_slim), np.asarray(y_mask),
                               atol=1e-5)


def test_unknown_criterion_rejected():
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    with pytest.raises(ValueError, match="criterion"):
        filter_scores_device(params, spec, criterion="banana")


def test_bn_l1_sparsity_training_shrinks_gammas():
    spec = _spec()
    params = init_params(spec, jax.random.key(0))
    imgs = jax.random.randint(jax.random.key(1), (4, 64, 64, 3), 0, 256,
                              jnp.uint8)
    tgts = np.zeros((4, 8, 5), np.float32)
    tgts[:, 0] = [1.0, 0.5, 0.5, 0.4, 0.4]
    tgts = jnp.asarray(tgts)

    means = {}
    for lam in (0.0, 1.0):
        config = TrainConfig.from_spec(spec, augment_flip=False,
                                       augment_jitter=0.0, bn_l1=lam,
                                       learning_rate=1e-3, burn_in=0,
                                       policy="constant")
        tx = make_optimizer(config)
        state = TrainState.create(params, tx, jax.random.key(2))
        step = make_train_step(spec, config, tx)
        for _ in range(40):
            state, m = step(state, imgs, tgts)
        gam = np.concatenate([
            np.abs(np.asarray(p["gamma"]).ravel())
            for p in state["params"].values() if "gamma" in p])
        means[lam] = float(gam.mean())
        if lam > 0:
            assert "gamma_l1" in m and np.isfinite(float(m["gamma_l1"]))
    # the penalty must polarize: mean |gamma| clearly below the
    # unpenalized run's (observed on CPU: 0.99 vs 0.68 at lam=1.0)
    assert means[1.0] < means[0.0] * 0.85, means
