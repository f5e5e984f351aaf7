"""Test harness setup.

Forces JAX onto CPU with 8 virtual devices BEFORE jax initializes — the
idiomatic TPU-project equivalent of a fake distributed backend (SURVEY.md
§4.6): mesh/pjit sharding logic is exercised without a real slice. The real
chip is used only by bench.py / the driver, never by unit tests.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
