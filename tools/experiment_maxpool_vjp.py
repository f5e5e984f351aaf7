"""A/B (REJECTED — kept as the measured record): custom first-argmax VJP
2x2/2 maxpool vs reduce_window's SelectAndScatter VJP, on the FULL pruned
fine-tune step (bench.py's config), interleaved A/B/A/B in one tunnel
window per the variance policy (docs/PERF.md).

Result (judge-round 3, rtt 29 ms): dead tie — 26.08/26.10 vs 26.10/26.07
ms/step across two interleaved trials. The elementwise winner-index
backward below is the optimal formulation (read x + write grad, no
scatter/pad/concat — an earlier `.at[].set` reassembly variant lowered to
4 full-res pads+copies and LOST ~1.6 ms/step); even so it only ties
SelectAndScatter, so production keeps reduce_window (simpler, supports
higher-order autodiff). Tie-gradient semantics of both forms are pinned
vs torch in tests/test_model_oracle.py.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from modelcompression_tpu.compress import (
    repack, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.models import init_params, yolov2_voc
from modelcompression_tpu.models import darknet
from modelcompression_tpu.train import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)
from modelcompression_tpu.utils.timing import measure_rtt, time_fn


@jax.custom_vjp
def _maxpool2x2(x):
    """2x2/2 VALID pool, reshape+axis-max forward (== reduce_window)."""
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(xr, axis=4), axis=2)


def _maxpool2x2_fwd(x):
    y = _maxpool2x2(x)
    return y, (x, y)


def _maxpool2x2_bwd(res, g):
    # Elementwise winner-index backward: the winning window position as a
    # half-res int code (0..3 row-major, first max wins — torch/S&S tie
    # rule), broadcast-upsampled and matched against each pixel's parity
    # code. HBM traffic = read x + write grad, the elementwise minimum.
    x, y = res
    b, h, w, c = x.shape
    x00 = x[:, 0::2, 0::2, :]
    x01 = x[:, 0::2, 1::2, :]
    x10 = x[:, 1::2, 0::2, :]
    widx = jnp.where(
        x00 == y, 0,
        jnp.where(x01 == y, 1, jnp.where(x10 == y, 2, 3))
    ).astype(jnp.int8)

    def up(a):
        a6 = jnp.broadcast_to(a[:, :, None, :, None, :],
                              (b, h // 2, 2, w // 2, 2, c))
        return a6.reshape(b, h, w, c)

    rpar = jax.lax.broadcasted_iota(jnp.int8, (b, h, w, c), 1) % 2
    cpar = jax.lax.broadcasted_iota(jnp.int8, (b, h, w, c), 2) % 2
    gz = g.astype(x.dtype)
    return (jnp.where(up(widx) == 2 * rpar + cpar, up(gz),
                      jnp.zeros((), gz.dtype)),)


_maxpool2x2.defvjp(_maxpool2x2_fwd, _maxpool2x2_bwd)

_orig_maxpool = darknet.maxpool
USE_CUSTOM = False


def _patched_maxpool(x, layer):
    k, s = layer.size, layer.stride
    h, w = x.shape[1], x.shape[2]
    if (USE_CUSTOM and k == 2 and s == 2 and layer.pad_total // 2 == 0
            and h % 2 == 0 and w % 2 == 0):
        return _maxpool2x2(x)
    return _orig_maxpool(x, layer)


def main():
    global USE_CUSTOM
    B, INNER = 64, 10
    spec = yolov2_voc()
    with jax.default_device(jax.devices("cpu")[0]):
        params_host = init_params(spec, jax.random.key(0))
    params = jax.device_put(jax.tree.map(np.asarray, params_host),
                            jax.devices()[0])
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
    sspec, sparams = repack(spec, params, keep)
    dev = jax.devices()[0]
    sparams = jax.device_put(sparams, dev)

    tcfg = TrainConfig.from_spec(sspec, augment_flip=True, subdivisions=1,
                                 max_boxes=30)
    tx = make_optimizer(tcfg)
    state = jax.device_put(
        TrainState.create(sparams, tx, jax.random.key(1)), dev)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (B, 416, 416, 3), np.uint8)), dev)
    tg = np.zeros((B, 30, 5), np.float32)
    tg[:, 0] = [0, 0.5, 0.5, 0.3, 0.3]
    targets = jax.device_put(jnp.asarray(tg), dev)
    jax.block_until_ready((sparams, state))

    # train_step imports maxpool BY NAME, so patch both binding sites
    from modelcompression_tpu.train import train_step as ts_mod
    darknet.maxpool = _patched_maxpool
    ts_mod.maxpool = _patched_maxpool
    try:
        programs = {}
        for name, flag in (("custom_vjp", True), ("select_scatter", False)):
            USE_CUSTOM = flag
            raw_step = make_train_step(sspec, tcfg, tx, jit_step=False)

            @jax.jit
            def p_full(st0, x8, t, salt, _raw=raw_step):
                def body(i, carry):
                    st, acc = carry
                    st2, m = _raw(st, x8 + (i % 2).astype(jnp.uint8), t)
                    return (st2, acc + m["loss"])
                _, acc = jax.lax.fori_loop(0, INNER, body, (st0, salt))
                return acc
            programs[name] = (lambda salt, _p=p_full:
                              _p(state, images, targets, salt))
    finally:
        darknet.maxpool = _orig_maxpool
        ts_mod.maxpool = _orig_maxpool

    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.0f} ms | batch {B} | inner {INNER} | pruned75 |"
          f" full fine-tune step", file=sys.stderr)
    for name, fn in programs.items():
        t0 = time.time()
        jax.block_until_ready(fn(jnp.float32(0)))
        print(f"compiled {name} in {time.time() - t0:.0f}s", file=sys.stderr)

    # interleaved: alternate A/B twice so congestion drift hits both arms
    for trial in range(2):
        for name, fn in programs.items():
            sec = time_fn(fn, iters=5, windows=3, rtt=rtt) / INNER
            print(f"trial {trial} {name:14s}: {sec * 1e3:7.2f} ms/step "
                  f"({B / sec:7.1f} img/s)")


if __name__ == "__main__":
    main()
