"""Mesh coverage for the COMPRESSION path (SURVEY.md §4.6, VERDICT r3 #5):
the framework's signature feature — the GMP on-device mask recompute
(compress/gmp.py, the segmented bisection inside the train step) — and
orbax checkpoint/resume must hold under DP/TP sharding, not just the
generic train step. All on the 8-virtual-CPU mesh (conftest)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modelcompression_tpu.compress.gmp import GMPSpec, gmp_init_masks
from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.parallel import param_specs
from modelcompression_tpu.train import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)

from tests.conftest import cpu_devices


# ONE scheduled recompute, at step 0 (t=0 tick; t==end is never reached
# in a 3-step run). The in-step recompute runs on the FRESHLY UPDATED
# weights (Zhu & Gupta ordering, train_step.py), which differ at ~1e-7
# between the mesh and single-device paths (cross-device reduction
# order) — so near-threshold rank picks can legitimately flip for a
# measure-zero sliver of weights. The full-step test therefore bounds
# mask divergence tightly instead of demanding identity; BIT-equality
# of the bisection itself under sharding is asserted separately on
# identical inputs (test_gmp_bisection_bit_equal_under_sharding — the
# bisection is integer compares + segment sums, order-independent).
GMP = GMPSpec(final_sparsity=0.5, initial_sparsity=0.5,
              begin=0, end=3, frequency=7)
N_STEPS = 3


def _setup(seed=0, w=32):
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=w, height=w))
    params = init_params(spec, jax.random.key(seed))
    config = TrainConfig.from_spec(spec, augment_flip=False,
                                   augment_jitter=0.0, precision=BITMATCH,
                                   gmp=GMP)
    return spec, params, config


def _batch(b=8, w=32, m=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (b, w, w, 3), dtype=np.uint8)
    targets = np.zeros((b, m, 5), np.float32)
    for i in range(b):
        targets[i, 0] = [rng.integers(0, 3), 0.5, 0.5, 0.4, 0.4]
    return jnp.asarray(images), jnp.asarray(targets)


def _fresh(params):
    return jax.tree.map(lambda v: jnp.asarray(np.asarray(v)), params)


def _run_gmp_steps(spec, params, config, mesh=None, tp=0, n_steps=N_STEPS):
    """n GMP train steps; params TP-sharded when tp>1, batch DP-sharded
    when a mesh is given. Returns (final state, per-step sparsities)."""
    tx = make_optimizer(config)
    state = TrainState.create(
        _fresh(params), tx, jax.random.key(1),
        weight_masks=gmp_init_masks(params, spec, GMP))
    if mesh is not None:
        if tp > 1:
            pspecs = param_specs(spec, state["params"], tp=True, tp_size=tp)
            state["params"] = {
                k: {n: jax.device_put(v, NamedSharding(mesh, pspecs[k][n]))
                    for n, v in p.items()}
                for k, p in state["params"].items()}
            for key in state:
                if key != "params":
                    state[key] = jax.tree.map(
                        lambda v: jax.device_put(v, NamedSharding(mesh, P())),
                        state[key])
        else:
            state = jax.device_put(state, NamedSharding(mesh, P()))
    step_fn = make_train_step(spec, config, tx)
    images, targets = _batch()
    if mesh is not None:
        images = jax.device_put(
            images, NamedSharding(mesh, P("data", None, None, None)))
        targets = jax.device_put(
            targets, NamedSharding(mesh, P("data", None, None)))
    sparsities = []
    for _ in range(n_steps):
        state, metrics = step_fn(state, images, targets)
        sparsities.append(float(metrics["sparsity"]))
    return state, sparsities


@pytest.mark.parametrize("tp", [0, 2])
def test_gmp_bisection_bit_equal_under_sharding(tp):
    """The segmented-bisection mask recompute on IDENTICAL inputs must be
    BIT-equal between single-device and mesh-sharded params (replicated
    or TP-sharded): the bisection is integer bit compares + segment
    sums, exactly order-independent, so sharding must not change a
    single mask bit."""
    from modelcompression_tpu.compress.gmp import gmp_masks

    spec, params, _ = _setup(seed=7)
    single = jax.jit(lambda p, s: gmp_masks(p, spec, s))(
        _fresh(params), jnp.float32(0.5))

    if tp > 1:
        mesh = Mesh(np.array(cpu_devices()).reshape(4, tp),
                    ("data", "model"))
        pspecs = param_specs(spec, params, tp=True, tp_size=tp)
        placed = {
            k: {n: jax.device_put(jnp.asarray(np.asarray(v)),
                                  NamedSharding(mesh, pspecs[k][n]))
                for n, v in p.items()}
            for k, p in params.items()}
    else:
        mesh = Mesh(np.array(cpu_devices()), ("data",))
        placed = jax.device_put(_fresh(params), NamedSharding(mesh, P()))
    sharded = jax.jit(lambda p, s: gmp_masks(p, spec, s))(
        placed, jnp.float32(0.5))

    for k, m in single.items():
        np.testing.assert_array_equal(
            np.asarray(m), np.asarray(sharded[k]),
            err_msg=f"bisection mask {k} diverged under sharding")
        assert int((~np.asarray(m)).sum()) == np.asarray(m).size // 2


def test_gmp_full_step_bit_equal_masks_under_mesh_at_zero_lr():
    """The FULL in-step GMP path (cond gating, bisection on the updated
    weights, mask application) under a DPxTP mesh, made bit-deterministic
    by a vanishing learning rate: with lr=1e-12 the post-update weights
    are bit-identical across shardings (updates round away), so the
    in-step recompute must produce BIT-equal masks and the masked
    weights must be exactly zero on both paths."""
    spec, params, config = _setup(seed=1)
    config = dataclasses.replace(config, learning_rate=1e-12)
    state1, sp1 = _run_gmp_steps(spec, params, config)
    mesh = Mesh(np.array(cpu_devices()).reshape(4, 2), ("data", "model"))
    state2, sp2 = _run_gmp_steps(spec, params, config, mesh=mesh, tp=2)

    assert sp1 == pytest.approx(sp2, abs=1e-7)
    assert sp1[-1] == pytest.approx(0.5, abs=0.01)
    for k, m1 in state1["weight_masks"].items():
        np.testing.assert_array_equal(
            np.asarray(m1), np.asarray(state2["weight_masks"][k]),
            err_msg=f"mask {k} diverged under the mesh at lr~0")
        z = ~np.asarray(m1)
        assert np.all(np.asarray(state1["params"][k]["w"])[z] == 0.0)
        assert np.all(np.asarray(state2["params"][k]["w"])[z] == 0.0)


@pytest.mark.parametrize("dp,tp", [(8, 0), (4, 2)])
def test_gmp_mask_recompute_matches_single_device(dp, tp):
    """The in-step mask recompute + masked updates under a mesh at a
    REAL learning rate — DP-sharded batch, replicated (dp case) or
    TP-sharded (dp,tp case) params — must match the single-device run
    up to the float-drift sliver (module comment): sparsity metrics
    equal, mask divergence tightly bounded, pruned weights exactly
    zero. (Exact numeric step equality without GMP is pinned by
    tests/test_train_step.py's DP/TP tests; bit-equality of the
    bisection and of the full step at lr~0 by the tests above.)"""
    spec, params, config = _setup()
    state1, sp1 = _run_gmp_steps(spec, params, config)

    if tp > 1:
        mesh = Mesh(np.array(cpu_devices()).reshape(dp, tp),
                    ("data", "model"))
    else:
        mesh = Mesh(np.array(cpu_devices()), ("data",))
    state2, sp2 = _run_gmp_steps(spec, params, config, mesh=mesh, tp=tp)

    assert sp1 == pytest.approx(sp2, abs=1e-4)
    assert sp1[-1] == pytest.approx(0.5, abs=0.01)
    for k, m1 in state1["weight_masks"].items():
        m1 = np.asarray(m1)
        m2 = np.asarray(state2["weight_masks"][k])
        n_diff = int((m1 != m2).sum())
        assert n_diff <= max(4, int(2e-3 * m1.size)), (
            f"mask {k}: {n_diff}/{m1.size} divergence under the mesh "
            f"(the float-drift sliver should flip near-threshold picks "
            f"only)")
        # pruned weights exactly zero on both paths (each against its
        # OWN masks — they may differ by the sliver)
        assert np.all(np.asarray(state1["params"][k]["w"])[~m1] == 0.0)
        assert np.all(np.asarray(state2["params"][k]["w"])[~m2] == 0.0)


def test_sharded_state_checkpoint_resume_bit_identical(tmp_path):
    """orbax save of a SHARDED TrainState (DPxTP mesh, GMP masks in the
    state) restores bit-identically and resumes to the same result as
    the uninterrupted sharded run (SURVEY.md §5.4 under §4.6's mesh)."""
    from modelcompression_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    spec, params, config = _setup(seed=3)
    mesh = Mesh(np.array(cpu_devices()).reshape(4, 2), ("data", "model"))
    tx = make_optimizer(config)

    def place(state):
        pspecs = param_specs(spec, state["params"], tp=True, tp_size=2)
        state["params"] = {
            k: {n: jax.device_put(v, NamedSharding(mesh, pspecs[k][n]))
                for n, v in p.items()}
            for k, p in state["params"].items()}
        for key in state:
            if key != "params":
                state[key] = jax.tree.map(
                    lambda v: jax.device_put(v, NamedSharding(mesh, P())),
                    state[key])
        return state

    state = place(TrainState.create(
        _fresh(params), tx, jax.random.key(4),
        weight_masks=gmp_init_masks(params, spec, GMP)))
    step_fn = make_train_step(spec, config, tx)
    images, targets = _batch(seed=3)
    images = jax.device_put(
        images, NamedSharding(mesh, P("data", None, None, None)))
    targets = jax.device_put(
        targets, NamedSharding(mesh, P("data", None, None)))

    state, _ = step_fn(state, images, targets)
    # uninterrupted twin continues from an independent copy of the state
    cont = place(jax.tree.map(
        lambda v: (jnp.asarray(np.asarray(v)) if not hasattr(v, "dtype")
                   or not jax.dtypes.issubdtype(v.dtype,
                                                jax.dtypes.prng_key)
                   else v), dict(state)))
    # save the sharded state directly: orbax must gather the shards
    ckdir = save_checkpoint(str(tmp_path / "ck"), 1, spec, dict(state),
                            extra={"note": "sharded"})

    target = TrainState.create(
        _fresh(params), tx, jax.random.key(4),
        weight_masks=gmp_init_masks(params, spec, GMP))
    spec2, restored, meta = load_checkpoint(ckdir, target=target)
    assert meta["step"] == 1 and meta["note"] == "sharded"

    # bit-identical restore (masks AND weights — the compression state)
    for k, p in state["params"].items():
        for n, v in p.items():
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(restored["params"][k][n]),
                                          err_msg=f"params/{k}/{n}")
    for k, m in state["weight_masks"].items():
        np.testing.assert_array_equal(
            np.asarray(m), np.asarray(restored["weight_masks"][k]),
            err_msg=f"mask {k}")

    # resume on the SAME mesh sharding: one more step on both paths
    # must agree bit-for-bit (same program, same inputs)
    resumed = place(TrainState(dict(restored)))
    cont, m1 = step_fn(TrainState(cont), images, targets)
    resumed, m2 = step_fn(resumed, images, targets)
    assert float(m1["loss"]) == float(m2["loss"])
    for k in cont["params"]:
        for n, v in cont["params"][k].items():
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(resumed["params"][k][n]),
                err_msg=f"resumed {k}/{n}")
    for k, m in cont["weight_masks"].items():
        np.testing.assert_array_equal(
            np.asarray(m), np.asarray(resumed["weight_masks"][k]),
            err_msg=f"resumed mask {k}")
