"""Sharding rules: DP batch sharding + optional TP channel sharding
(SURVEY.md §2.3, §5.8).

The scaling model is GSPMD: annotate inputs with NamedShardings over a
(data, model) mesh and let XLA insert the collectives (gradient all-reduce
over ICI for DP; all-gather/reduce-scatter pairs for TP conv channels).
There is no hand-written communication — that is the TPU-native replacement
for the NCCL layer the reference never had (SURVEY.md §5.8).

PP/SP/EP are deliberately out of scope: the model fits one chip and has no
sequence axis (SURVEY.md §2.3 table).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modelcompression_tpu.models.cfg import ConvLayer, NetworkSpec
from modelcompression_tpu.models.darknet import Params, conv_key


def batch_spec() -> P:
    return P("data", None, None, None)


def param_specs(spec: NetworkSpec, params: Params,
                tp: bool = False, tp_size: int = 1
                ) -> Dict[str, Dict[str, P]]:
    """PartitionSpec tree for the params pytree.

    DP: everything replicated. TP: conv filters (HWIO dim 3) and the
    matching BN/bias vectors sharded over 'model' where the filter count
    divides the axis; the detection conv and small layers stay replicated
    (a 125-channel conv does not shard cleanly and is negligible FLOPs).
    """
    specs: Dict[str, Dict[str, P]] = {}
    for i, l in enumerate(spec.layers):
        if not isinstance(l, ConvLayer):
            continue
        k = conv_key(i)
        p = params[k]
        if tp and tp_size > 1 and l.filters % tp_size == 0:
            w_spec = P(None, None, None, "model")
            v_spec = P("model")
        else:
            w_spec = P()
            v_spec = P()
        specs[k] = {n: (w_spec if n == "w" else v_spec) for n in p}
    return specs


def shard_params(params: Params, mesh: Mesh, spec: NetworkSpec,
                 tp: bool = False) -> Params:
    tp_size = mesh.shape.get("model", 1)
    ps = param_specs(spec, params, tp=tp, tp_size=tp_size)
    return jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        params, ps,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)))


def shard_batch(tree, mesh: Mesh):
    """Place (images, targets, ...) arrays with batch dim sharded on
    'data'."""
    def put(x):
        ndim = x.ndim
        return jax.device_put(
            x, NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1)))))
    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def place_train_state(state, mesh: Mesh, spec: NetworkSpec,
                      tp: bool = False):
    """Place a TrainState on a mesh: params TP-sharded over 'model' (or
    replicated with tp=False), everything else replicated. With GSPMD this
    placement plus a 'data'-sharded batch (shard_batch) is all a jitted
    train step needs — the gradient all-reduce appears in the compiled
    program automatically. Returns a new state of the same type."""
    tp_size = mesh.shape.get("model", 1)
    pspecs = param_specs(spec, state["params"], tp=tp, tp_size=tp_size)
    out = dict(state)
    out["params"] = {
        k: {n: jax.device_put(v, NamedSharding(mesh, pspecs[k][n]))
            for n, v in p.items()}
        for k, p in state["params"].items()}
    for key in out:
        if key == "params":
            continue
        out[key] = jax.tree.map(
            lambda v: jax.device_put(v, NamedSharding(mesh, P())),
            out[key])
    return type(state)(out)
