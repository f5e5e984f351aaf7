"""Device mesh construction for DP (+ optional TP) sharding.

The reference is a single-process CPU project (SURVEY.md §1.2: no distributed
layer exists there). The TPU build's scaling story (SURVEY.md §2.3, §5.7-5.8)
is: a ``jax.sharding.Mesh`` with a ``data`` axis for batch sharding (gradient
all-reduce rides ICI, inserted by GSPMD) and an optional ``model`` axis for
tensor-parallel sharding of conv channel dimensions. PP/SP/EP have no
counterpart for a ≤51M-param CNN detector with no sequence axis and are
deliberately out of scope (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1


def effective_platform() -> str:
    """Platform of the backend that will actually execute eager ops.

    Tests (and users fighting this environment's sitecustomize) pin
    ``jax_default_device`` to CPU while the TPU plugin stays registered,
    so bare ``jax.default_backend()`` / ``jax.devices()`` are misleading.
    The config value may legally be a Device OR a platform string."""
    d = jax.config.jax_default_device
    if d is None:
        return jax.default_backend()
    return d if isinstance(d, str) else d.platform


def make_mesh(config: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a (data, model) mesh.

    With ``config=None``, all visible devices go on the data axis — the
    right default for a CNN that fits one chip (DP scales batch 64
    streaming per BASELINE.json:11).
    """
    if devices is None:
        # devices of the backend that will actually execute
        devices = jax.devices(effective_platform())
    if config is None:
        config = MeshConfig(data=len(devices), model=1)
    n = config.data * config.model
    if n > len(devices):
        raise ValueError(
            f"mesh {config} needs {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(config.data, config.model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for NHWC image batches."""
    return NamedSharding(mesh, P("data", None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
