"""utils/timing.py unit tests (the bench's measurement methodology)."""

import jax
import jax.numpy as jnp

from modelcompression_tpu.utils.timing import measure_rtt, time_fn


def test_measure_rtt_positive():
    rtt = measure_rtt()
    assert 0 < rtt < 5.0


def test_time_fn_measures_a_jitted_op():
    x = jnp.ones((256, 256))
    f = jax.jit(lambda a: a @ a)
    sec = time_fn(lambda: f(x), iters=10, windows=2)
    assert 0 <= sec < 1.0


def test_time_fn_salts_each_call():
    """A fn accepting one positional arg receives a DISTINCT float32 salt
    per call — the defense against the tunnel serving repeat executions
    with identical (executable, args) memoized (utils/timing.py)."""
    seen = []

    def fn(salt):
        seen.append(float(salt))
        return jnp.ones(()) * salt

    time_fn(fn, iters=4, windows=2, warmup=1, rtt=0.0)
    assert len(seen) == 1 + 4 * 2
    assert len(set(seen)) == len(seen), seen


def test_time_fn_rejects_mis_signatured_fn():
    """Salting is opt-in BY NAME (advisor r1): a fn whose required
    positional parameter is not called 'salt' expected its own argument —
    injecting a float32 would silently corrupt the measurement, so it
    must fail loudly instead."""
    import pytest

    def fn(images):
        return jnp.zeros(())

    with pytest.raises(TypeError, match="salt"):
        time_fn(fn, iters=2, windows=1, warmup=0, rtt=0.0)


def test_time_fn_rtt_floor():
    # subtracting an oversized rtt must floor at zero, not go negative
    f = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,))
    sec = time_fn(lambda: f(x), iters=5, windows=2, rtt=100.0)
    assert sec == 0.0
