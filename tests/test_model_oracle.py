"""Numerics oracle tests (SURVEY.md §4.1): the JAX NHWC model must match the
in-repo torch NCHW oracle op-by-op and end-to-end at fp32 tolerance under the
BITMATCH precision policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.core.precision import BITMATCH, FAST
from modelcompression_tpu.models import (
    MaxPoolLayer, forward, fold_batchnorm, forward_folded,
    init_params, maxpool, parse_cfg, reorg, tiny_yolov2_voc, yolov2_voc,
)
from tests.oracle.torch_ref import torch_forward, torch_maxpool, torch_reorg

import torch
import torch.nn.functional as F


def nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2)))


def test_reorg_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 8, 10)).astype(np.float32)  # NCHW
    want = torch_reorg(torch.from_numpy(x), 2).numpy()
    got = nchw(np.asarray(reorg(jnp.asarray(nhwc(x)), 2)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size,stride,hw", [(2, 2, 8), (2, 2, 13),
                                            (2, 1, 13), (3, 2, 13)])
def test_maxpool_matches_oracle(size, stride, hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, hw, hw)).astype(np.float32)
    want = torch_maxpool(torch.from_numpy(x), size, stride).numpy()
    got = nchw(np.asarray(maxpool(
        jnp.asarray(nhwc(x)),
        MaxPoolLayer(size=size, stride=stride))))
    np.testing.assert_array_equal(got, want)


def test_maxpool2x2_grad_matches_oracle_on_ties():
    """The 2x2/2 fast path's custom VJP must route each window's cotangent
    to the FIRST maximal element in row-major window order — exactly
    torch's max_pool2d backward (and XLA SelectAndScatter's) tie rule.
    Values from a 3-symbol alphabet force many exact ties."""
    rng = np.random.default_rng(7)
    x = rng.integers(0, 3, (2, 4, 8, 8)).astype(np.float32)  # NCHW
    gw = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    yt = F.max_pool2d(xt, kernel_size=2, stride=2)
    yt.backward(torch.from_numpy(gw))
    want = xt.grad.numpy()

    def f(xin):
        return jnp.sum(maxpool(xin, MaxPoolLayer(size=2, stride=2))
                       * jnp.asarray(nhwc(gw)))

    got = nchw(np.asarray(jax.grad(f)(jnp.asarray(nhwc(x)))))
    np.testing.assert_array_equal(got, want)


TINY_CFG = """
[net]
width=32
height=32
channels=3
[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky
[maxpool]
size=2
stride=2
[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky
[maxpool]
size=2
stride=1
[route]
layers=-1
[convolutional]
size=1
stride=1
pad=1
filters=12
activation=linear
[region]
anchors = 1.0,1.0, 2.0,2.0
classes=1
num=2
"""


def _randomize(params, rng):
    """Well-conditioned random params: He-scaled conv weights, BN params near
    identity — keeps deep-stack activations O(1) so fp32 tolerances are
    meaningful."""
    out = {}
    for k, p in params.items():
        q = {}
        for name, v in p.items():
            if name == "w":
                fan_in = int(np.prod(v.shape[:3]))
                q[name] = jnp.asarray(
                    rng.standard_normal(v.shape).astype(np.float32)
                    * np.sqrt(2.0 / fan_in))
            elif name == "var":
                q[name] = jnp.asarray(
                    rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
            elif name == "gamma":
                q[name] = jnp.asarray(
                    rng.uniform(0.8, 1.2, v.shape).astype(np.float32))
            else:  # beta, mean, bias
                q[name] = jnp.asarray(
                    rng.standard_normal(v.shape).astype(np.float32) * 0.1)
        out[k] = q
    return out


def test_small_net_matches_oracle_exactly():
    spec = parse_cfg(TINY_CFG)
    rng = np.random.default_rng(2)
    params = _randomize(init_params(spec, jax.random.key(0)), rng)
    x = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    want = torch_forward(jax.tree.map(np.asarray, params), x, spec)
    got = nchw(np.asarray(forward(params, jnp.asarray(nhwc(x)), spec,
                                  BITMATCH)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("builder,in_hw", [(tiny_yolov2_voc, 128),
                                           (yolov2_voc, 128)])
def test_full_model_matches_oracle(builder, in_hw):
    """Full YOLOv2 / Tiny-YOLOv2 graphs vs torch oracle at reduced input
    resolution (128 -> 4x4 grid) to keep CPU runtime reasonable."""
    spec = builder()
    rng = np.random.default_rng(3)
    params = _randomize(init_params(spec, jax.random.key(1)), rng)
    x = rng.uniform(0, 1, (1, 3, in_hw, in_hw)).astype(np.float32)
    want = torch_forward(jax.tree.map(np.asarray, params), x, spec)
    got = nchw(np.asarray(forward(params, jnp.asarray(nhwc(x)), spec,
                                  BITMATCH)))
    assert got.shape == want.shape
    assert got.shape[1] == 125 and got.shape[2] == in_hw // 32
    # deep stacks accumulate rounding; activations here are O(1e2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_folded_bn_close_to_unfolded():
    spec = tiny_yolov2_voc()
    rng = np.random.default_rng(4)
    params = _randomize(init_params(spec, jax.random.key(2)), rng)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y0 = np.asarray(forward(params, x, spec, BITMATCH))
    y1 = np.asarray(forward_folded(fold_batchnorm(params, spec), x, spec,
                                   BITMATCH))
    np.testing.assert_allclose(y1, y0, rtol=1e-3, atol=1e-3)


def test_fast_policy_runs_and_is_close():
    spec = tiny_yolov2_voc()
    rng = np.random.default_rng(5)
    params = _randomize(init_params(spec, jax.random.key(3)), rng)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y0 = np.asarray(forward(params, x, spec, BITMATCH))
    y1 = np.asarray(forward(params, x, spec, FAST))
    assert y1.dtype == np.float32
    # bf16 compute: loose agreement only
    err = np.abs(y1 - y0) / (np.abs(y0) + 1.0)
    assert np.median(err) < 0.05


def test_train_stats_batchnorm_matches_oracle():
    spec = parse_cfg(TINY_CFG)
    rng = np.random.default_rng(6)
    params = _randomize(init_params(spec, jax.random.key(4)), rng)
    x = rng.uniform(0, 1, (4, 3, 32, 32)).astype(np.float32)
    want = torch_forward(jax.tree.map(np.asarray, params), x, spec,
                         train_stats=True)
    got = nchw(np.asarray(forward(params, jnp.asarray(nhwc(x)), spec,
                                  BITMATCH, train_stats=True)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
