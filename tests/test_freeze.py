"""TrainConfig.freeze_prefix (finetune/train --freeze N): the first N conv
layers are fully frozen — zero gradients, inference-style BN on running
stats, params AND running stats bit-identical through updates — while the
rest of the network trains normally."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.models.darknet import conv_key
from modelcompression_tpu.models.cfg import ConvLayer
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.train import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
    merge_params, split_trainable,
)
from modelcompression_tpu.train.train_step import _forward_train
from modelcompression_tpu.train.region_loss import region_loss


def setup(freeze, seed=0, w=64):
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=w, height=w))
    params = init_params(spec, jax.random.key(seed))
    config = TrainConfig.from_spec(
        spec, augment_flip=False, augment_jitter=0.0, precision=BITMATCH,
        freeze_prefix=freeze)
    return spec, params, config


def batch(b=4, w=64, m=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (b, w, w, 3), dtype=np.uint8)
    targets = np.zeros((b, m, 5), np.float32)
    for i in range(b):
        targets[i, 0] = [rng.integers(0, 3), 0.5, 0.5, 0.4, 0.4]
    return jnp.asarray(images), jnp.asarray(targets)


def conv_keys(spec):
    return [conv_key(i) for i, l in enumerate(spec.layers)
            if isinstance(l, ConvLayer)]


def test_frozen_prefix_bit_identical_and_rest_trains():
    spec, params, config = setup(freeze=1)
    keys = conv_keys(spec)
    before = jax.tree.map(np.asarray, params)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(1))
    step_fn = make_train_step(spec, config, tx)
    images, targets = batch()
    for _ in range(3):
        state, _ = step_fn(state, images, targets)
    after = state["params"]
    # frozen conv: every tensor (w, gamma, beta, mean, var) bit-identical —
    # weight decay must not creep, running stats must not fold
    for name, v in after[keys[0]].items():
        np.testing.assert_array_equal(np.asarray(v), before[keys[0]][name],
                                      err_msg=f"frozen {name} moved")
    # the rest of the network trained (weights AND running stats moved)
    assert not np.allclose(np.asarray(after[keys[1]]["w"]),
                           before[keys[1]]["w"])
    assert not np.allclose(np.asarray(after[keys[1]]["mean"]),
                           before[keys[1]]["mean"])


def test_frozen_grads_are_zero_and_stats_omitted():
    spec, params, config = setup(freeze=1)
    keys = conv_keys(spec)
    trainable, stats = split_trainable(params)
    images, targets = batch()
    x = images.astype(jnp.float32) / 255.0
    freeze = frozenset([keys[0]])

    def loss(tr):
        raw, bstats = _forward_train(merge_params(tr, stats), x, spec,
                                     BITMATCH, {}, freeze=freeze)
        return region_loss(raw, targets, spec.region,
                           jnp.zeros((), jnp.int32)).loss, bstats

    (_, bstats), grads = jax.value_and_grad(loss, has_aux=True)(trainable)
    # no batch statistics for the frozen layer (inference BN)
    assert keys[0] not in bstats and keys[1] in bstats
    for name, g in grads[keys[0]].items():
        np.testing.assert_array_equal(np.asarray(g), 0.0,
                                      err_msg=f"frozen grad {name} nonzero")
    assert any(float(jnp.abs(g).max()) > 0
               for g in jax.tree.leaves(grads[keys[1]]))


def test_frozen_layer_uses_running_stats():
    # against a hand-rolled inference BN for layer 0: with layer 0 frozen,
    # the training forward's first activation must use mean/var (running),
    # not the batch statistics
    spec, params, config = setup(freeze=1)
    keys = conv_keys(spec)
    # make running stats VERY different from batch stats so misuse shows
    p0 = params[keys[0]]
    params[keys[0]] = dict(p0, mean=p0["mean"] + 3.0, var=p0["var"] * 7.0)
    images, targets = batch()
    x = images.astype(jnp.float32) / 255.0
    raw_frozen, _ = _forward_train(params, x, spec, BITMATCH, {},
                                   freeze=frozenset([keys[0]]))
    raw_train, _ = _forward_train(params, x, spec, BITMATCH, {})
    assert not np.allclose(np.asarray(raw_frozen), np.asarray(raw_train))


def test_freeze_validation():
    spec, params, config = setup(freeze=0)
    n_convs = len(conv_keys(spec))
    bad = TrainConfig.from_spec(spec, freeze_prefix=n_convs)
    with pytest.raises(ValueError, match="freeze_prefix"):
        make_train_step(spec, bad)
