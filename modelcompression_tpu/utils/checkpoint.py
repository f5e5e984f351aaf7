"""Checkpoint / resume (SURVEY.md §5.4): orbax for train state + the cfg
text of the (possibly slimmed) architecture, so resume can rebuild the right
shapes after structured repack; Darknet .weights import/export lives in
models/weights_io.py for reference interchange."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from modelcompression_tpu.models.cfg import NetworkSpec, dump_cfg, parse_cfg


def _ckpt_dir(path: str, step: int) -> str:
    return os.path.join(os.path.abspath(path), f"step_{step:08d}")


def _is_prng_key(v) -> bool:
    return (hasattr(v, "dtype")
            and jax.dtypes.issubdtype(v.dtype, jax.dtypes.prng_key))


def save_checkpoint(path: str, step: int, spec: NetworkSpec,
                    state: Dict[str, Any],
                    extra: Optional[Dict[str, Any]] = None) -> str:
    """Save train state + architecture. ``state`` is any pytree (the
    TrainState dict). PRNG-key leaves are stored as raw key data and
    re-wrapped on load. Returns the checkpoint directory."""
    import orbax.checkpoint as ocp
    d = _ckpt_dir(path, step)
    os.makedirs(os.path.dirname(d), exist_ok=True)

    prng_paths = []

    def to_host(path_, v):
        if _is_prng_key(v):
            prng_paths.append(jax.tree_util.keystr(path_))
            return np.asarray(jax.random.key_data(v))
        return np.asarray(v)

    host_state = jax.tree_util.tree_map_with_path(to_host, state)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(d, "state"), host_state, force=True)
    with open(os.path.join(d, "arch.cfg"), "w") as f:
        f.write(dump_cfg(spec))
    meta = {"step": step, "prng_paths": prng_paths}
    meta.update(extra or {})
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    return d


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    steps = sorted(d for d in os.listdir(path) if d.startswith("step_"))
    return os.path.join(path, steps[-1]) if steps else None


def load_checkpoint(ckpt_dir: str, target: Any = None
                    ) -> Tuple[NetworkSpec, Dict[str, Any], Dict[str, Any]]:
    """Returns (spec, state, meta). State arrays come back as numpy; callers
    re-device-put / re-shard as needed (resume-safe across topologies).

    ``target``: optional pytree with the desired structure (e.g. a freshly
    built TrainState) — orbax loses container types (optax NamedTuples come
    back as dicts), so the restored leaves are re-hung on the target's
    treedef when given.
    """
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(ckpt_dir, "state"))
    with open(os.path.join(ckpt_dir, "arch.cfg")) as f:
        spec = parse_cfg(f.read())
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)

    prng_paths = set(meta.get("prng_paths", []))
    if prng_paths:
        def wrap(path_, v):
            if jax.tree_util.keystr(path_) in prng_paths:
                return jax.random.wrap_key_data(jax.numpy.asarray(v))
            return v
        state = jax.tree_util.tree_map_with_path(wrap, state)

    if target is not None:
        leaves = jax.tree.leaves(state)
        treedef = jax.tree.structure(target)
        if treedef.num_leaves != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves but target expects "
                f"{treedef.num_leaves} — architecture/optimizer mismatch")
        state = jax.tree.unflatten(treedef, leaves)
    return spec, state, meta
