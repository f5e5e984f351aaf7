"""Mesh/sharding tests (SURVEY.md §4.6): TP param specs, mesh construction,
and the driver-contract multichip dryrun on the virtual 8-CPU mesh."""

import importlib.util
import os

import jax
from jax.sharding import PartitionSpec as P

from modelcompression_tpu.core.mesh import MeshConfig, make_mesh
from modelcompression_tpu.models import init_params, yolov2_voc
from modelcompression_tpu.parallel import param_specs

from tests.conftest import cpu_devices


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=4, model=2), devices=cpu_devices())
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(devices=cpu_devices())
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_param_specs_tp():
    spec = yolov2_voc()
    params = init_params(spec, jax.random.key(0))
    specs = param_specs(spec, params, tp=True, tp_size=2)
    # big conv: filters sharded on 'model' (HWIO dim 3), BN vectors too
    k = "conv0"  # 32 filters, divisible by 2
    assert specs[k]["w"] == P(None, None, None, "model")
    assert specs[k]["gamma"] == P("model")
    # detection conv (125 filters, not divisible): replicated
    det = f"conv{spec.conv_indices()[-1]}"
    assert specs[det]["w"] == P()
    # dp-only: everything replicated
    specs_dp = param_specs(spec, params, tp=False)
    assert all(s == P() for layer in specs_dp.values()
               for s in layer.values())


def test_dryrun_multichip_8():
    """The driver contract: full train step over an 8-device mesh executes
    (real DP x TP shardings, GSPMD collectives on the virtual CPU mesh).

    dryrun_multichip itself runs the step in a scrubbed subprocess with
    signal-death retries (on a 1-core host running 8 virtual devices,
    XLA:CPU's collective rendezvous can hit its hard timeout and SIGABRT
    — in-process that would kill the whole pytest run)."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    s = importlib.util.spec_from_file_location("graft_entry", path)
    m = importlib.util.module_from_spec(s)
    s.loader.exec_module(m)
    m.dryrun_multichip(8)  # raises on failure


def test_effective_platform_accepts_string_default_device():
    """jax.config.jax_default_device may hold a platform STRING (e.g. via
    JAX_DEFAULT_DEVICE=cpu); platform detection and make_mesh must not
    crash on it (review finding: .platform on a str)."""
    from modelcompression_tpu.core.mesh import effective_platform
    prev = jax.config.jax_default_device
    try:
        jax.config.update("jax_default_device", "cpu")
        assert effective_platform() == "cpu"
        mesh = make_mesh(MeshConfig(data=2, model=1))
        assert dict(mesh.shape) == {"data": 2, "model": 1}
    finally:
        jax.config.update("jax_default_device", prev)
