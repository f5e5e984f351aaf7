#!/usr/bin/env python
"""On-chip A/B: maxpool formulations at the pruned model's hot shape.

The pruned-step trace (docs/PERF.md) charges ~0.47 ms of the 4.7 ms batch
to maxpool1 — a 2x2/stride-2 reduce_window over (64, 416, 416, 8), where
C=8 wastes most of the 128 VPU lanes. Candidate: the same pool as a
reshape + two maxes ((B,H/2,2,W/2,2,C) -> max over the window dims),
which XLA may fuse/vectorize differently. Also timed inside the REAL
fused pruned pipeline to see end-to-end effect.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from modelcompression_tpu.utils.timing import measure_rtt, time_fn

    B, H, W, C = 64, 416, 416, 8
    rng = np.random.default_rng(0)
    print("rtt probe...", file=sys.stderr, flush=True)
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.0f} ms", file=sys.stderr, flush=True)
    # ship uint8 (88MB) over the tunnel, cast to bf16 on device
    x8 = jax.device_put(rng.integers(0, 255, (B, H, W, C), np.uint8))
    jax.block_until_ready(x8)
    print("input on device", file=sys.stderr, flush=True)
    x = jax.jit(lambda a: a.astype(jnp.bfloat16) / 16.0)(x8)
    jax.block_until_ready(x)
    print("cast done", file=sys.stderr, flush=True)

    @jax.jit
    def pool_rw(x, salt):
        def body(i, acc):
            y = jax.lax.reduce_window(
                x + salt.astype(x.dtype), -jnp.inf, jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1),
                ((0, 0), (0, 0), (0, 0), (0, 0)))
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, 10, body, salt)

    @jax.jit
    def pool_reshape(x, salt):
        def body(i, acc):
            xi = x + salt.astype(x.dtype)
            b, h, w, c = xi.shape
            y = xi.reshape(b, h // 2, 2, w // 2, 2, c)
            y = jnp.max(jnp.max(y, axis=4), axis=2)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, 10, body, salt)

    for name, fn in (("reduce_window", pool_rw),
                     ("reshape+max", pool_reshape)):
        jax.block_until_ready(fn(x, jnp.float32(0)))
        sec = time_fn(lambda salt, fn=fn: fn(x, salt), iters=10, windows=3,
                      rtt=rtt) / 10
        print(f"{name:>14}: {sec*1e6:.0f} us per pool "
              f"({B*H*W*C*2/sec/1e9:.0f} GB/s effective)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
