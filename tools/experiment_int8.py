#!/usr/bin/env python
"""On-chip A/B: int8 vs bf16 convolution at representative YOLOv2 shapes.

TPU v5e's MXU advertises ~2x int8 throughput vs bf16 (394 TOPS vs
197 TFLOPS class), and int8 activations halve HBM traffic — the two walls
of the unpruned pipeline (docs/PERF.md: deep stack ~100% bf16 MFU,
early convs HBM-bound). This measures whether an int8 inference path
(compress/quantize.py) can beat the bf16 FAST path per-layer before
committing to it end-to-end.

Each int8 timing includes the FULL requantization chain a quantized
network pays between layers (int32 -> scale -> bias -> leaky -> int8),
so the comparison is honest about epilogue overhead, not just MACs.

Usage: python tools/experiment_int8.py   (TPU; one JSON line per shape)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, B, H, W, Cin, Cout, k): conv2 = early/HBM-bound, conv6-7 = mid,
# conv14+ = deep/MXU-bound (the bf16 ~100% MFU regime)
SHAPES = [
    ("early_208x208_32to64", 64, 208, 208, 32, 64, 3),
    ("mid_52x52_256to512", 64, 52, 52, 256, 512, 3),
    ("deep_13x13_1024to1024", 64, 13, 13, 1024, 1024, 3),
]
INNER = 10


def main():
    import jax
    import jax.numpy as jnp

    from modelcompression_tpu.utils.timing import measure_rtt, time_fn

    print("rtt probe...", file=sys.stderr, flush=True)
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.0f} ms", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    for label, B, H, W, Cin, Cout, k in SHAPES:
        # device-resident inputs; ship int8/uint8 over the tunnel
        x8 = jax.device_put(
            rng.integers(-127, 128, (B, H, W, Cin), np.int8))
        w8 = jax.device_put(
            rng.integers(-127, 128, (k, k, Cin, Cout), np.int8))
        jax.block_until_ready((x8, w8))
        xb = jax.jit(lambda a: (a.astype(jnp.bfloat16) / 127.0))(x8)
        wb = jax.jit(lambda a: (a.astype(jnp.bfloat16) / 127.0))(w8)
        scale = jax.device_put(
            rng.uniform(1e-3, 2e-3, (Cout,)).astype(np.float32))
        bias = jax.device_put(
            rng.uniform(-0.5, 0.5, (Cout,)).astype(np.float32))
        jax.block_until_ready((xb, wb, scale, bias))

        def conv(x, w, accum):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=accum)

        @jax.jit
        def run_bf16(salt):
            # FAST-path epilogue: bias + leaky, bf16 throughout
            def body(i, acc):
                xi = xb + acc.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)
                y = conv(xi, wb, jnp.bfloat16)
                y = y + bias.astype(jnp.bfloat16)
                y = jnp.where(y > 0, y, 0.1 * y)
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, INNER, body, salt)

        @jax.jit
        def run_int8(salt):
            # quantized-path epilogue: int32 -> f32 scale -> bias -> leaky
            # -> requantize to int8 (what flows to the next layer)
            def body(i, acc):
                si = (jnp.mod(acc, 3.0)).astype(jnp.int8)
                xi = x8 + si  # salt-dependent input, still int8
                y32 = conv(xi, w8, jnp.int32)
                y = y32.astype(jnp.float32) * scale + bias
                y = jnp.where(y > 0, y, 0.1 * y)
                q = jnp.clip(jnp.round(y * 64.0), -127, 127).astype(jnp.int8)
                return acc + jnp.sum(q.astype(jnp.int32)).astype(jnp.float32)
            return jax.lax.fori_loop(0, INNER, body, salt)

        flops = 2 * B * H * W * k * k * Cin * Cout * INNER
        row = {"shape": label}
        for name, fn in (("bf16", run_bf16), ("int8", run_int8)):
            try:
                t = time_fn(fn, iters=3, windows=3, rtt=rtt)
            except Exception as e:  # int8 conv may not lower on this stack
                row[name] = f"FAILED: {type(e).__name__}: {e}"
                continue
            per_conv_ms = t / INNER * 1e3
            row[name + "_ms"] = round(per_conv_ms, 3)
            row[name + "_tops"] = round(flops / t / 1e12, 1)
        if "bf16_ms" in row and "int8_ms" in row:
            row["int8_speedup"] = round(row["bf16_ms"] / row["int8_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
