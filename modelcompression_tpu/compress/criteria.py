"""Pruning criteria — pure-XLA reference implementations (SURVEY.md A.5,
BASELINE.json:5: per-layer magnitude, global sparsity threshold, L1-norm
filter ranking).

All three run fully on device with static shapes. Semantics are exact and
deterministic: masks are **rank-based** (stable argsort of |w|), so with ties
the earliest-index weights are pruned first and the mask always has exactly
``floor(sparsity * n)`` zeros — the property the hypothesis tests pin
(SURVEY.md §4.2). The fused Pallas kernels in ops/ are drop-in replacements
tested equal to these (same signatures, SURVEY.md §7.2.3).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from modelcompression_tpu.models.cfg import ConvLayer, NetworkSpec
from modelcompression_tpu.models.darknet import Params, conv_key


def _rank_mask_flat(flat_abs: jnp.ndarray, n_zero) -> jnp.ndarray:
    """Boolean keep-mask over a flat |w| vector: False for the ``n_zero``
    smallest entries (ties broken by index). ``n_zero`` may be traced."""
    order = jnp.argsort(flat_abs, stable=True)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.size))
    return ranks >= n_zero


def magnitude_mask_layer(w: jnp.ndarray, sparsity: float) -> jnp.ndarray:
    """Per-layer unstructured magnitude mask (config 2, BASELINE.json:8).

    Returns a bool mask of w's shape with exactly floor(sparsity*n) False
    entries marking the smallest-|w| weights.
    """
    n = w.size
    n_zero = int(sparsity * n)
    flat = jnp.abs(w).reshape(-1)
    return _rank_mask_flat(flat, n_zero).reshape(w.shape)


def magnitude_masks_perlayer(params: Params, spec: NetworkSpec,
                             sparsity: float,
                             skip: Sequence[int] = ()) -> Dict[str, jnp.ndarray]:
    """Masks for every conv layer (optionally skipping indices, e.g. the
    detection conv)."""
    masks = {}
    for i, l in enumerate(spec.layers):
        if not isinstance(l, ConvLayer) or i in skip:
            continue
        masks[conv_key(i)] = magnitude_mask_layer(params[conv_key(i)]["w"],
                                                  sparsity)
    return masks


def magnitude_masks_global(params: Params, spec: NetworkSpec,
                           sparsity: float,
                           skip: Sequence[int] = ()) -> Dict[str, jnp.ndarray]:
    """Global sparsity thresholding (BASELINE.json:5): one rank cut across
    the concatenation of all conv weights. Runs as a single device-side
    sort — no host round-trip (the north-star's requirement)."""
    keys: List[str] = [conv_key(i) for i, l in enumerate(spec.layers)
                       if isinstance(l, ConvLayer) and i not in skip]
    flats = [jnp.abs(params[k]["w"]).reshape(-1) for k in keys]
    sizes = [f.size for f in flats]
    cat = jnp.concatenate(flats)
    n_zero = int(sparsity * cat.size)
    mask_flat = _rank_mask_flat(cat, n_zero)
    masks = {}
    off = 0
    for k, sz in zip(keys, sizes):
        masks[k] = mask_flat[off:off + sz].reshape(params[k]["w"].shape)
        off += sz
    return masks


def global_threshold(params: Params, spec: NetworkSpec, sparsity: float,
                     skip: Sequence[int] = ()) -> jnp.ndarray:
    """The |w| value at the global sparsity cut (diagnostic / Pallas input)."""
    keys = [conv_key(i) for i, l in enumerate(spec.layers)
            if isinstance(l, ConvLayer) and i not in skip]
    cat = jnp.concatenate([jnp.abs(params[k]["w"]).reshape(-1)
                           for k in keys])
    k_idx = min(int(sparsity * cat.size), cat.size - 1)
    return jnp.sort(cat)[k_idx]


def l1_filter_scores(w_hwio) -> "np.ndarray":
    """Li et al. 2017 filter score: sum |W[:,:,:,j]| per output filter j
    (SURVEY.md A.5). Returns (O,).

    Host numpy on purpose: filter ranking is a one-shot prune-time op over
    a few thousand scores, and a device implementation costs one XLA
    compile per distinct conv shape (~30s each on a remote-compile TPU
    path) for zero steady-state benefit. The fine-tune-loop mask recompute
    — the op BASELINE.json:5 requires on-device — is ops/topk_mask +
    ops/pallas_topk, not this.
    """
    import numpy as np
    return np.sum(np.abs(np.asarray(w_hwio)), axis=(0, 1, 2))


def l1_filter_keep(w_hwio, fraction: float) -> "np.ndarray":
    """Keep-set for one conv: drop the floor(fraction*O) lowest-L1 filters.

    Returns sorted int32 indices of kept filters (ties: lower index pruned
    first, matching the rank rule above).
    """
    import numpy as np
    scores = l1_filter_scores(w_hwio)
    o = scores.shape[0]
    n_drop = int(fraction * o)
    order = np.argsort(scores, kind="stable")  # ascending
    keep = np.sort(order[n_drop:])
    return keep.astype(np.int32)


def l1_filter_keep_sets(params: Params, spec: NetworkSpec, fraction: float,
                        skip: Sequence[int] = ()) -> Dict[int, jnp.ndarray]:
    """Keep-sets for all prunable convs. The detection conv (the last conv,
    producing A*(5+classes) channels) is always protected — its channel
    count is the decode contract."""
    conv_idx = spec.conv_indices()
    protected = set(skip) | {conv_idx[-1]}
    out = {}
    for i in conv_idx:
        if i in protected:
            continue
        out[i] = l1_filter_keep(params[conv_key(i)]["w"], fraction)
    return out


def mask_sparsity(masks: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Achieved sparsity: fraction of zeros across all masked tensors."""
    total = sum(m.size for m in masks.values())
    zeros = sum(jnp.sum(~m) for m in masks.values())
    return zeros / total


def apply_masks(params: Params, masks: Dict[str, jnp.ndarray]) -> Params:
    """w <- w * mask for every masked layer; other entries untouched."""
    out = {}
    for k, p in params.items():
        if k in masks:
            q = dict(p)
            q["w"] = p["w"] * masks[k].astype(p["w"].dtype)
            out[k] = q
        else:
            out[k] = p
    return out
