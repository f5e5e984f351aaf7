"""Test harness setup.

Forces JAX onto CPU with 8 virtual devices — the idiomatic TPU-project
equivalent of a fake distributed backend (SURVEY.md §4.6): mesh/pjit
sharding logic is exercised without a real slice. The real chip is used only
by bench.py / the driver, never by unit tests.

Environment quirk: this machine's sitecustomize force-registers the ``axon``
TPU PJRT plugin in every interpreter and overrides ``JAX_PLATFORMS`` — so
setting env vars is NOT enough (tests would silently dispatch every eager op
through a ~40ms network tunnel). The reliable pin is
``jax.config.update("jax_default_device", cpu)`` after import, plus
``XLA_FLAGS`` before the CPU backend initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force (driver env sets 'axon')
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

_CPUS = jax.devices("cpu")
assert len(_CPUS) == 8, f"expected 8 virtual CPU devices, got {len(_CPUS)}"
jax.config.update("jax_default_device", _CPUS[0])


def cpu_devices():
    return _CPUS
