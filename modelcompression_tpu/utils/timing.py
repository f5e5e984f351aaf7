"""Robust device timing over a high-latency PJRT tunnel.

This environment reaches its TPU through a network tunnel whose round-trip
latency is volatile (40 ms normally, ~400 ms under congestion). A naive
``block_until_ready`` window therefore carries one tunnel RTT of pure noise
— at 20 iterations that is 2–20 ms *per iteration* of measurement error,
larger than the thing being measured. ``time_fn`` fixes the methodology:

* each window enqueues ``iters`` executions asynchronously and blocks once,
  so the RTT is paid once per window, not per step;
* the RTT itself is measured with an empty round-trip right before each
  window and subtracted;
* the reported value is the MIN over ``windows`` windows (min, not mean:
  tunnel congestion only ever adds time).
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def measure_rtt(device=None, probes: int = 3) -> float:
    """Seconds for one host->device->host no-op round trip (min of probes)."""
    x = jax.device_put(jax.numpy.zeros((8, 128)), device)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(probes):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(jax.numpy.zeros(()), device))
        best = min(best, time.perf_counter() - t0)
    return best


def time_fn(fn: Callable[[], object], iters: int = 50, windows: int = 3,
            warmup: int = 2, rtt: float | None = None) -> float:
    """Per-call seconds of an async-dispatchable device computation.

    ``fn()`` must enqueue work and return something blockable
    (jax.block_until_ready-able). Returns min-over-windows of
    (window_time - rtt) / iters, floored at 0.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn())
    if rtt is None:
        rtt = measure_rtt()
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = min(best, max(dt - rtt, 0.0) / iters)
    return best
