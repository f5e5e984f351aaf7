"""Robust device timing over a high-latency PJRT tunnel.

This environment reaches its TPU through a network tunnel with two
behaviors that make naive timing meaningless (both measured here):

1. **Volatile RTT** — 40–400 ms under congestion, sub-millisecond when the
   relay is quiet. A naive ``block_until_ready`` window carries one RTT of
   noise each.
2. **``block_until_ready`` can complete without the work executing.** Under
   some relay states, blocking on an un-read result resolves when the
   execute is *enqueued*, not when it lands on the chip; and a repeat
   execution with identical (executable, args) can be served memoized in
   ~0.2 ms. A measurement that never READS its outputs can report
   microseconds for a 400 ms program. (Measured: the same 20-forward
   fori_loop program read 380 ms/call when its result was fetched and
   0.2 ms/call when merely blocked on.)

``time_fn``'s methodology therefore:

* each window enqueues ``iters`` executions asynchronously and forces a
  device→host READ of the last output — a read cannot complete before the
  execution it depends on;
* if ``fn`` accepts a positional argument, a fresh float32 salt is passed
  per call so no two calls share identical args (defeats
  execute-memoization. Thread it into the program so it cannot be sliced
  away — e.g. as the init of the accumulating loop carry);
* the RTT is measured with a read-based probe on unique payloads (puts of
  identical content are content-deduped by the tunnel) and subtracted once
  per window;
* the reported value is the MIN over ``windows`` windows (min, not mean:
  tunnel congestion only ever adds time).
"""

from __future__ import annotations

import inspect
import itertools
import time
from typing import Callable

import jax
import numpy as np


def salted_pipeline_loop(step, inner: int = 10):
    """The ONE lie-proof inner-loop form every serving-pipeline bench in
    this repo uses (bench.py, tools/bench_*): a jitted
    ``many(params, images_u8, img_w, img_h, salt)`` running ``inner``
    iterations of the fused eval ``step`` inside one ``lax.fori_loop``.

    Why each piece exists (module docstring hazards; do NOT simplify):
    * ONE dispatch for ``inner`` pipeline iterations — under tunnel
      congestion per-execute dispatch latency (~2-3 ms) exceeds a pruned
      model's step, so per-dispatch timing measures the host's enqueue
      rate, not the chip;
    * the uint8 input is perturbed per iteration so XLA cannot CSE the
      loop body into a single execution;
    * the WHOLE scores output feeds the carry (summing a slice would let
      XLA narrow batch/spatial dims through the entire conv chain);
    * the carry INIT is ``time_fn``'s per-call salt, so no two timed
      calls share identical args and the tunnel cannot serve repeat
      executions memoized.
    """
    import jax.numpy as jnp

    @jax.jit
    def many(p, u8, w_, h_, salt):
        def body(i, acc):
            u8_i = u8 + (i % 2).astype(jnp.uint8)
            out = step(p, u8_i, w_, h_)
            return acc + jnp.sum(out[1])  # scores, consumed in full
        return jax.lax.fori_loop(0, inner, body, salt)

    return many


def measure_rtt(device=None, probes: int = 3) -> float:
    """Seconds for one host->device->host round trip (min of probes).

    Each probe puts a small UNIQUE payload and reads it back: the read
    forces a genuine round trip (block-only probes resolve early under the
    tunnel's async-completion mode) and unique content defeats the
    tunnel's transfer dedupe.
    """
    rng = np.random.default_rng(int(time.time_ns()) % (2**31))
    # warm the transfer path (allocator, layouts) outside the timed probes
    np.asarray(jax.device_put(rng.integers(0, 2**31, 8, np.int64), device))
    best = float("inf")
    for _ in range(probes):
        buf = rng.integers(0, 2**31, 8, np.int64)
        t0 = time.perf_counter()
        np.asarray(jax.device_put(buf, device))
        best = min(best, time.perf_counter() - t0)
    return best


def _fn_takes_salt(fn: Callable) -> bool:
    """Salting is opt-in BY NAME: only a first required positional
    parameter literally called ``salt`` receives the per-call salt. Any
    other required positional parameter is a caller bug (the fn expects
    its own argument and would silently get a float32 injected — a wrong
    measurement), so it fails loudly instead."""
    try:
        params = inspect.signature(fn).parameters.values()
    except (TypeError, ValueError):
        return False
    required = [
        p for p in params
        if p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                      inspect.Parameter.POSITIONAL_OR_KEYWORD)
        and p.default is inspect.Parameter.empty]
    if not required:
        return False
    if required[0].name == "salt":
        return True
    raise TypeError(
        f"time_fn: fn has a required positional parameter "
        f"{required[0].name!r}. Name it 'salt' (and thread it into the "
        "program, e.g. as a loop-carry init) to opt into per-call "
        "salting, or bind the argument before timing.")


def _force_read(out) -> None:
    """Fetch (part of) ``out`` to host — completion-proof, cheap."""
    leaves = jax.tree.leaves(out)
    if not leaves:  # None / leafless pytree: keep block_until_ready's
        jax.block_until_ready(out)  # permissive contract
        return
    leaf = leaves[0]
    if not hasattr(leaf, "size") or leaf.size <= 65536:
        np.asarray(leaf)
    else:
        # avoid dragging a large buffer over the (possibly slow) link
        jax.device_get(leaf.ravel()[0])


def time_fn(fn: Callable, iters: int = 50, windows: int = 3,
            warmup: int = 2, rtt: float | None = None) -> float:
    """Per-call seconds of an async-dispatchable device computation.

    ``fn`` either takes no arguments, or one positional argument NAMED
    ``salt`` — a fresh ``jnp.float32`` per call (pass it through the
    computation, e.g. as a loop-carry init, so every call has distinct
    args). A required positional parameter with any other name raises
    (explicit opt-in prevents silently mis-measuring a fn that expected
    its own argument). It must return something fetchable; prefer a
    scalar so the forced read is one small round trip. Returns
    min-over-windows of (window_time - rtt) / iters, floored at 0.
    """
    import jax.numpy as jnp

    salts = itertools.count()
    takes_salt = _fn_takes_salt(fn)

    def call():
        if takes_salt:
            return fn(jnp.float32(next(salts) % 65536))
        return fn()

    for _ in range(warmup):
        _force_read(call())
    if rtt is None:
        rtt = measure_rtt()
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = call()
        _force_read(out)
        dt = time.perf_counter() - t0
        best = min(best, max(dt - rtt, 0.0) / iters)
    return best
