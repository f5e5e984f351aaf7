"""LAMP — Layer-Adaptive Magnitude-based Pruning (Lee et al., ICLR 2021).

A fourth unstructured criterion beside per-layer magnitude, the global
|w| threshold, and GMP (SURVEY.md A.5 family). Plain global magnitude
pruning is known to starve early small layers (their weights are
numerically small even when functionally critical); LAMP fixes the layer
imbalance by ranking each weight by its magnitude RELATIVE to the still-
surviving mass of its own layer:

    score(u) = w_u^2 / sum_{v in layer(u), |w_v| >= |w_u|} w_v^2

(the denominator includes u itself, so each layer's largest weight scores
exactly 1.0 and a layer is never emptied before every other layer is).
One global rank cut over the scores then yields automatically layer-
adaptive sparsities — the paper shows this matches or beats hand-tuned
per-layer budgets.

TPU shape: scoring needs each layer's weights in descending-|w| order
(the suffix sums ARE the denominators), so this criterion is inherently
sort-based. All layers' sorts + suffix sums + the global rank cut run as
ONE jitted XLA program with a single host->device round trip — one
compile for the whole network signature (unlike the per-shape argsort
trap documented in ops/topk_mask.py:5-8, which paid one compile PER conv
shape). Pruning is a one-shot offline op, so the single sort-heavy
program is the right trade; the in-training ramp (GMP) keeps using the
bisection kernels.

Tie rule matches the rest of the framework (stable ascending argsort:
with equal |w| the earlier-index weight ranks lower / prunes first), and
the mask has exactly ``floor(sparsity * n_total)`` zeros.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from modelcompression_tpu.models.cfg import ConvLayer, NetworkSpec
from modelcompression_tpu.models.darknet import Params, conv_key


def lamp_scores_flat(w: jnp.ndarray) -> jnp.ndarray:
    """LAMP scores for ONE layer, flattened: w^2 over the inclusive suffix
    sum of w^2 in descending-magnitude order, scattered back to original
    positions. Returns a flat (n,) float32 vector in (0, 1]."""
    flat = jnp.square(w.astype(jnp.float32).reshape(-1))
    order = jnp.argsort(flat, stable=True)           # ascending
    srt = flat[order]
    # inclusive suffix sum in ascending order == "all weights at least as
    # large as me" (ties: later ascending rank, i.e. later index, counts
    # in the earlier one's denominator — the inclusive >= of the paper)
    suffix = jnp.cumsum(srt[::-1])[::-1]
    score_sorted = srt / jnp.maximum(suffix, 1e-30)
    return jnp.zeros_like(flat).at[order].set(score_sorted)


def _lamp_masks_jit(ws: Dict[str, jnp.ndarray], n_zero: jnp.ndarray
                    ) -> Dict[str, jnp.ndarray]:
    scores: List[jnp.ndarray] = []
    keys = sorted(ws)
    for k in keys:
        scores.append(lamp_scores_flat(ws[k]))
    cat = jnp.concatenate(scores)
    order = jnp.argsort(cat, stable=True)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.size))
    mask_flat = ranks >= n_zero
    out, off = {}, 0
    for k in keys:
        sz = ws[k].size
        out[k] = mask_flat[off:off + sz].reshape(ws[k].shape)
        off += sz
    return out


# n_zero rides in as a traced scalar so the iterative loop's changing
# per-round sparsities reuse ONE executable (remote compile is 20-50 s).
_lamp_masks_compiled = jax.jit(_lamp_masks_jit)


# module-level (like _lamp_masks_compiled) so repeat diagnostic calls with
# the same weight signature reuse the executable — a closure-local @jax.jit
# would retrace per call, paying the 20-50 s remote compile every time
@jax.jit
def _lamp_scores_compiled(ws: Dict[str, jnp.ndarray]
                          ) -> Dict[str, jnp.ndarray]:
    return {k: lamp_scores_flat(w).reshape(w.shape)
            for k, w in ws.items()}


def lamp_scores_device(params: Params, spec: NetworkSpec,
                       skip: Sequence[int] = ()
                       ) -> Dict[str, jnp.ndarray]:
    """Per-weight LAMP scores for every prunable conv (diagnostic /
    test surface). One jitted program, cached at module level."""
    keys = [conv_key(i) for i, l in enumerate(spec.layers)
            if isinstance(l, ConvLayer) and i not in skip]
    return _lamp_scores_compiled({k: params[k]["w"] for k in keys})


def lamp_masks(params: Params, spec: NetworkSpec, sparsity: float,
               skip: Sequence[int] = ()) -> Dict[str, jnp.ndarray]:
    """Keep-masks at a GLOBAL ``sparsity`` with LAMP's layer-adaptive
    allocation. Exactly ``floor(sparsity * n_total)`` False entries across
    all prunable convs; drop-in for ``magnitude_masks_global`` (same
    signature, same apply/save path)."""
    keys = [conv_key(i) for i, l in enumerate(spec.layers)
            if isinstance(l, ConvLayer) and i not in skip]
    ws = {k: params[k]["w"] for k in keys}
    n_total = sum(w.size for w in ws.values())
    n_zero = int(sparsity * n_total)
    return dict(_lamp_masks_compiled(ws, jnp.int32(n_zero)))


def lamp_layer_sparsities(masks: Dict[str, jnp.ndarray]
                          ) -> Dict[str, float]:
    """Achieved per-layer sparsity of a mask set (the quantity LAMP
    allocates adaptively — useful for reporting next to the global
    target)."""
    return {k: float(jnp.mean(~m)) for k, m in masks.items()}
