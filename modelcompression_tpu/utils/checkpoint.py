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


def _to_host_tree(state: Any):
    """Copy a state pytree to host numpy, unwrapping PRNG keys to raw key
    data; returns (host_tree, keystr list of the PRNG leaves)."""
    prng_paths = []

    def to_host(path_, v):
        if _is_prng_key(v):
            prng_paths.append(jax.tree_util.keystr(path_))
            return np.asarray(jax.random.key_data(v))
        return np.asarray(v)

    return jax.tree_util.tree_map_with_path(to_host, state), prng_paths


def save_checkpoint(path: str, step: int, spec: NetworkSpec,
                    state: Dict[str, Any],
                    extra: Optional[Dict[str, Any]] = None) -> str:
    """Save train state + architecture. ``state`` is any pytree (the
    TrainState dict). PRNG-key leaves are stored as raw key data and
    re-wrapped on load. Returns the checkpoint directory."""
    import orbax.checkpoint as ocp
    d = _ckpt_dir(path, step)
    os.makedirs(os.path.dirname(d), exist_ok=True)

    host_state, prng_paths = _to_host_tree(state)
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
    built TrainState) — orbax serializes container types (optax
    NamedTuples) as dicts on disk, so restoring WITHOUT a target returns
    plain dicts. With a target, orbax restores INTO the target's structure
    matching nodes BY NAME — never by flatten order, which differs between
    NamedTuples (field order) and dicts (sorted keys) and would silently
    permute leaves for non-alphabetical optimizer states.
    """
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(ckpt_dir, "state"))
    with open(os.path.join(ckpt_dir, "arch.cfg")) as f:
        spec = parse_cfg(f.read())
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)

    if target is not None:
        state = _rehang(state, target)

    prng_paths = set(meta.get("prng_paths", []))
    if prng_paths:
        # after _rehang the structure (hence keystrs) matches the one
        # recorded at save time; the no-target path restores plain dicts,
        # whose keystrs match only for dict-contained keys (the TrainState
        # layout) — keep PRNG keys under dicts when saving without a
        # matching target.
        def wrap(path_, v):
            if jax.tree_util.keystr(path_) in prng_paths:
                return jax.random.wrap_key_data(jax.numpy.asarray(v))
            return v
        state = jax.tree_util.tree_map_with_path(wrap, state)

    return spec, state, meta


def _rehang(restored: Any, target: Any) -> Any:
    """Re-hang orbax-restored leaves on the target's container types BY
    NAME, never by flatten order — NamedTuples flatten in field order while
    their restored dicts flatten in sorted-key order, so order-based
    ``tree_unflatten`` silently permutes non-alphabetical optimizer states.
    Orbax stores NamedTuples as dicts keyed by field name and plain
    tuples/lists as dicts keyed by the index string."""
    if isinstance(target, dict):
        if not isinstance(restored, dict):
            raise ValueError(f"checkpoint node is {type(restored).__name__},"
                             f" target expects a dict")
        return type(target)(
            (k, _rehang(restored[k], v)) for k, v in target.items())
    if hasattr(target, "_fields"):  # NamedTuple
        vals = []
        for i, f in enumerate(target._fields):
            node = (restored.get(f, restored.get(str(i)))
                    if isinstance(restored, dict) else restored[i])
            vals.append(_rehang(node, getattr(target, f)))
        return type(target)(*vals)
    if isinstance(target, (list, tuple)):
        items = []
        for i, v in enumerate(target):
            node = (restored[str(i)] if isinstance(restored, dict)
                    else restored[i])
            items.append(_rehang(node, v))
        return type(target)(items)
    return restored  # leaf
