"""Tracing / profiling helpers (SURVEY.md §5.1): jax.profiler trace contexts
around train/eval steps (perfetto traces) + a step timer reporting
images/sec/chip — the headline metric (BASELINE.json:2)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """Capture a jax.profiler trace if trace_dir is set, else no-op."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StepTimer:
    """Rolling images/sec meter. Call .tick(batch) after each (blocking)
    step; warmup steps are excluded from the average."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.n_steps = 0
        self.n_images = 0
        self._start = None
        if warmup == 0:  # clock starts immediately; ticks count from step 1
            self._start = time.perf_counter()

    def tick(self, batch_size: int) -> None:
        self.n_steps += 1
        if self.n_steps == self.warmup:
            self._start = time.perf_counter()
            self.n_images = 0
        elif self.n_steps > self.warmup:
            self.n_images += batch_size

    @property
    def images_per_sec(self) -> float:
        if self._start is None or self.n_images == 0:
            return 0.0
        dt = time.perf_counter() - self._start
        return self.n_images / dt if dt > 0 else 0.0


def nan_check(tree, name: str = "tree") -> None:
    """Debug tripwire (SURVEY.md §5.2): assert no NaN/Inf in a pytree.
    Host-side; call sparingly (forces a sync)."""
    import jax.numpy as jnp
    leaves = jax.tree.leaves(tree)
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            if bool(jnp.any(~jnp.isfinite(leaf))):
                raise FloatingPointError(
                    f"non-finite values in {name} leaf {i}")
