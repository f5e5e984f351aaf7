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

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from modelcompression_tpu.compress.graph import protected_conv_indices
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


@jax.jit
def _l1_scores_jit(ws: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """One XLA program: per-filter L1 of every conv in the tree (one fused
    reduce per layer, single compile for the whole network signature)."""
    return {k: jnp.sum(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
            for k, w in ws.items()}


def l1_filter_scores(w_hwio) -> jnp.ndarray:
    """Li et al. 2017 filter score: sum |W[:,:,:,j]| per output filter j
    (SURVEY.md A.5). Returns (O,)."""
    return jnp.sum(jnp.abs(jnp.asarray(w_hwio, jnp.float32)), axis=(0, 1, 2))


def l1_filter_scores_device(params: Params, spec: NetworkSpec,
                            skip: Sequence[int] = ()
                            ) -> Dict[int, "np.ndarray"]:
    """All prunable convs' filter scores as ONE device program + ONE host
    readback (the iterative loop calls this every round; per-layer eager
    reduces would pay one tunnel round-trip per conv). Structurally
    unprunable convs are always protected (compress/graph.py): every
    head-producing conv — its channel count is the decode contract —
    plus shortcut-tied convs (YOLOv3 residual identity paths)."""
    import numpy as np
    conv_idx = spec.conv_indices()
    protected = set(skip) | protected_conv_indices(spec)
    ws = {conv_key(i): params[conv_key(i)]["w"]
          for i in conv_idx if i not in protected}
    scores = jax.device_get(_l1_scores_jit(ws))
    return {i: np.asarray(scores[conv_key(i)])
            for i in conv_idx if i not in protected}


def bn_gamma_scores_device(params: Params, spec: NetworkSpec,
                           skip: Sequence[int] = ()
                           ) -> Dict[int, "np.ndarray"]:
    """Network-slimming filter scores (Liu et al. 2017): |gamma| of each
    conv's BN scale — the learned per-channel importance the slimming
    recipe trains toward zero with an L1 penalty (TrainConfig.bn_l1).

    Same one-device-program + one-readback shape as
    ``l1_filter_scores_device``. Convs WITHOUT batch-norm have no gamma;
    they fall back to their (normalized) L1 filter score so mixed cfgs
    still produce a full keep-set map — in the YOLOv2 family only the
    protected detection conv is BN-free, so the fallback is normally
    unused. Head-producing and shortcut-tied convs are always protected
    (compress/graph.py).
    """
    import numpy as np
    conv_idx = spec.conv_indices()
    protected = set(skip) | protected_conv_indices(spec)
    gs, ws = {}, {}
    for i in conv_idx:
        if i in protected:
            continue
        k = conv_key(i)
        if spec.layers[i].batch_normalize:
            gs[k] = params[k]["gamma"]
        else:
            ws[k] = params[k]["w"]

    @jax.jit
    def score(gs, ws):
        out = {k: jnp.abs(g.astype(jnp.float32)) for k, g in gs.items()}
        for k, w in ws.items():
            l1 = jnp.sum(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
            # scale-normalize so the fallback is comparable per layer
            out[k] = l1 / jnp.maximum(jnp.max(l1), 1e-12)
        return out

    scores = jax.device_get(score(gs, ws))
    return {i: np.asarray(scores[conv_key(i)])
            for i in conv_idx if i not in protected}


@jax.jit
def _fpgm_scores_jit(ws: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """One XLA program: every conv's filter distance-sums. Each layer is
    one (O,D)x(D,O) Gram matmul (MXU work) + an elementwise sqrt/reduce —
    the largest YOLOv2 layer is O=1024, D=9216, trivial on device."""
    out = {}
    for k, w in ws.items():
        x = w.astype(jnp.float32).reshape(-1, w.shape[-1]).T  # (O, D)
        sq = jnp.sum(x * x, axis=1)
        # HIGHEST precision: the ||a||²+||b||²−2ab form cancels badly for
        # near-identical filters (exactly what FPGM ranks), and the TPU's
        # default bf16 MXU pass would drown those distances in rounding.
        # Pruning is one-shot/offline, so the fp32 matmul cost is trivial.
        gram = jnp.matmul(x, x.T, precision=jax.lax.Precision.HIGHEST)
        d2 = sq[:, None] + sq[None, :] - 2.0 * gram
        out[k] = jnp.sum(jnp.sqrt(jnp.maximum(d2, 0.0)), axis=1)
    return out


def fpgm_filter_scores(w_hwio) -> jnp.ndarray:
    """FPGM filter score (He et al. 2019, CVPR — 'Filter Pruning via
    Geometric Median'): score_j = sum_i ||F_j - F_i||_2, the summed
    Euclidean distance from filter j to every other filter in the layer.
    Filters with the SMALLEST distance sum sit nearest the layer's
    geometric median — they are the most replaceable by the others and
    are pruned first (the paper's 'distance-sum' form, used by its
    released implementation). Data-free, like l1/bn_gamma. Returns (O,)."""
    return _fpgm_scores_jit({"w": jnp.asarray(w_hwio)})["w"]


def fpgm_scores_device(params: Params, spec: NetworkSpec,
                       skip: Sequence[int] = ()
                       ) -> Dict[int, "np.ndarray"]:
    """All prunable convs' FPGM distance-sum scores as ONE device program
    + ONE host readback (same shape as ``l1_filter_scores_device``).
    Head-producing and shortcut-tied convs are always protected
    (compress/graph.py)."""
    import numpy as np
    conv_idx = spec.conv_indices()
    protected = set(skip) | protected_conv_indices(spec)
    ws = {conv_key(i): params[conv_key(i)]["w"]
          for i in conv_idx if i not in protected}
    scores = jax.device_get(_fpgm_scores_jit(ws))
    return {i: np.asarray(scores[conv_key(i)])
            for i in conv_idx if i not in protected}


FILTER_CRITERIA = ("l1", "bn_gamma", "fpgm")


def filter_scores_device(params: Params, spec: NetworkSpec,
                         criterion: str = "l1",
                         skip: Sequence[int] = ()
                         ) -> Dict[int, "np.ndarray"]:
    """Structured filter scores under the chosen criterion: ``l1``
    (Li et al. 2017 weight norms), ``bn_gamma`` (Liu et al. 2017
    network slimming), or ``fpgm`` (He et al. 2019 geometric-median
    distance sums)."""
    if criterion == "l1":
        return l1_filter_scores_device(params, spec, skip=skip)
    if criterion == "bn_gamma":
        return bn_gamma_scores_device(params, spec, skip=skip)
    if criterion == "fpgm":
        return fpgm_scores_device(params, spec, skip=skip)
    raise ValueError(
        f"unknown filter criterion {criterion!r} (one of {FILTER_CRITERIA})")


def _keep_from_scores(scores: "np.ndarray", fraction: float) -> "np.ndarray":
    """Drop the floor(fraction*O) lowest-score filters; ties: lower index
    pruned first (the rank rule above). Returns sorted kept indices."""
    import numpy as np
    n_drop = int(fraction * scores.shape[0])
    order = np.argsort(scores, kind="stable")  # ascending
    return np.sort(order[n_drop:]).astype(np.int32)


def keep_sets_from_scores(scores: Dict[int, "np.ndarray"],
                          fraction: float = None,
                          fractions: Dict[int, float] = None,
                          default: float = 0.0) -> Dict[int, "np.ndarray"]:
    """Rank-select keep-sets from ANY per-filter score map (L1, bn_gamma,
    Taylor, ...): uniform ``fraction``, or a per-layer ``fractions``
    schedule with ``default`` for unlisted layers. Same tie rule as every
    criterion here (lowest index pruned first)."""
    import numpy as np
    if fractions is not None:
        unknown = set(fractions) - set(scores)
        if unknown:
            raise ValueError(
                f"fractions given for non-scored conv indices "
                f"{sorted(unknown)}")
        return {i: _keep_from_scores(np.asarray(s), fractions.get(i, default))
                for i, s in scores.items()}
    if fraction is None:
        raise ValueError("need fraction or fractions")
    return {i: _keep_from_scores(np.asarray(s), fraction)
            for i, s in scores.items()}


def l1_filter_keep(w_hwio, fraction: float) -> "np.ndarray":
    """Keep-set for one conv: drop the floor(fraction*O) lowest-L1 filters."""
    import numpy as np
    return _keep_from_scores(np.asarray(l1_filter_scores(w_hwio)), fraction)


def l1_filter_keep_sets(params: Params, spec: NetworkSpec, fraction: float,
                        skip: Sequence[int] = (),
                        criterion: str = "l1") -> Dict[int, "np.ndarray"]:
    """Keep-sets for all prunable convs: device scores (one program), then
    the tiny (O,) rank selections on host — keep indices must materialize
    as Python ints anyway to define the repacked static shapes.
    ``criterion`` selects the score (``l1`` | ``bn_gamma``)."""
    scores = filter_scores_device(params, spec, criterion=criterion,
                                  skip=skip)
    return {i: _keep_from_scores(s, fraction) for i, s in scores.items()}


def _criterion_scores(params: Params, spec: NetworkSpec,
                      idxs, criterion: str) -> Dict[int, "np.ndarray"]:
    """Raw per-filter scores for an EXPLICIT conv-index list under the
    chosen data-free criterion (no protection filtering) — the shared
    scoring pass behind the tied-group and CSP-balanced keep-set
    builders. One device program + one readback."""
    import numpy as np
    if criterion not in FILTER_CRITERIA:
        raise ValueError(
            f"unknown filter criterion {criterion!r} "
            f"(one of {FILTER_CRITERIA})")
    idxs = list(idxs)
    if not idxs:
        return {}
    ws = {conv_key(i): params[conv_key(i)]["w"] for i in idxs}
    if criterion == "fpgm":
        sc = jax.device_get(_fpgm_scores_jit(ws))
    else:
        sc = jax.device_get(_l1_scores_jit(ws))
    out = {i: np.asarray(sc[conv_key(i)], np.float64) for i in idxs}
    if criterion == "bn_gamma":
        # |gamma| where BN exists (the slimming importance); the L1
        # fallback is scale-normalized per layer like the untied path
        for i in idxs:
            if spec.layers[i].batch_normalize:
                out[i] = np.abs(np.asarray(params[conv_key(i)]["gamma"],
                                           np.float64))
            else:
                out[i] = out[i] / max(float(out[i].max()), 1e-12)
    return out


def csp_balanced_keep_sets(params: Params, spec: NetworkSpec,
                           fraction: float, skip: Sequence[int] = (),
                           criterion: str = "l1"
                           ) -> Dict[int, "np.ndarray"]:
    """Split-BALANCED structured pruning of CSP grouped-route source
    convs (graph.csp_split_constraints): each conv's channels are
    ranked WITHIN each contiguous split block and the drop fraction is
    applied per block, so every block loses the same count — the
    repacked tensor's group slice then equals the kept subset of the
    original slice exactly (kept channels stay ascending, so the
    repacked block boundary lands between the blocks; validated again
    by repack). Convs that are also head-producing, shortcut-tied,
    explicitly skipped, or feeding a grouped route whose sliced tensor
    has multi-conv provenance (graph.grouped_route_protected_convs —
    balancing ONE source cannot keep a multi-source slice boundary
    valid) stay protected."""
    return {i: csp_balanced_keep_from_scores(s, parts, fraction)
            for i, (parts, s) in csp_balanced_scores_device(
                params, spec, criterion=criterion, skip=skip).items()}


def csp_constrainable_indices(spec: NetworkSpec,
                              skip: Sequence[int] = ()) -> Dict[int, int]:
    """``{conv_idx: n_parts}`` for the CSP grouped-route source convs
    that CAN be split-balance-pruned under the default protections:
    the csp_split_constraints map minus head-producing, shortcut-tied,
    multi-provenance-sliced (grouped_route_protected_convs) and
    explicitly skipped convs. The shared eligibility rule behind
    ``csp_balanced_keep_sets``, the budget allocator's ``csp_scores``
    input and the per-layer schedule path."""
    from modelcompression_tpu.compress.graph import (
        csp_split_constraints, grouped_route_protected_convs,
        head_producer_convs, tied_conv_groups,
    )
    constraints = csp_split_constraints(spec)
    protected = (head_producer_convs(spec)
                 | grouped_route_protected_convs(spec) | set(skip))
    for g in tied_conv_groups(spec):
        protected |= g
    return {i: p for i, p in constraints.items() if i not in protected}


def csp_balanced_scores_device(params: Params, spec: NetworkSpec,
                               criterion: str = "l1",
                               skip: Sequence[int] = ()
                               ) -> Dict[int, tuple]:
    """Per-filter scores for the balance-constrainable CSP source convs,
    keyed for the FLOP-budget allocator: ``{conv_idx: (n_parts,
    (O,) float64 scores)}`` (``flops.flop_targeted_keep_sets(
    csp_scores=...)``). Same one-device-program scoring as every other
    path (_criterion_scores)."""
    constraints = csp_constrainable_indices(spec, skip)
    scores = _criterion_scores(params, spec, sorted(constraints),
                               criterion)
    return {i: (constraints[i], scores[i]) for i in constraints}


def csp_balanced_keep_from_scores(scores: "np.ndarray", parts: int,
                                  fraction: float) -> "np.ndarray":
    """Split-BALANCED keep-set from one conv's (O,) scores: rank within
    each of the ``parts`` contiguous blocks, drop ``fraction`` per
    block — every block loses the same count, so the repacked slice
    boundary stays between blocks (csp_balanced_keep_sets docstring)."""
    import numpy as np
    block = len(scores) // parts
    assert block * parts == len(scores), (
        f"{len(scores)} filters not divisible by {parts} split blocks")
    keeps = []
    for p in range(parts):
        lo = p * block
        keeps.append(_keep_from_scores(scores[lo:lo + block], fraction)
                     + lo)
    return np.concatenate(keeps).astype(np.int32)


def tied_group_scores_device(params: Params, spec: NetworkSpec,
                             criterion: str = "l1",
                             skip: Sequence[int] = ()
                             ) -> Dict[tuple, "np.ndarray"]:
    """Group-summed per-filter scores for every fully-unprotected tied
    group: ``{tuple(sorted group conv idxs): (O,) float64}``. The rank
    key of ``tied_group_keep_sets`` and the group input of
    ``flops.flop_targeted_keep_sets(group_scores=...)`` — a channel is
    only cheap to drop if it is unimportant in EVERY member feeding the
    [shortcut] adds. ONE device program + one readback, like the untied
    score paths."""
    import numpy as np

    from modelcompression_tpu.compress.graph import (
        grouped_route_source_convs, head_producer_convs, tied_conv_groups,
    )
    protected = (head_producer_convs(spec)
                 | grouped_route_source_convs(spec) | set(skip))
    groups = [sorted(g) for g in tied_conv_groups(spec)
              if not (g & protected)]
    members = [i for g in groups for i in g]
    sc = _criterion_scores(params, spec, members, criterion)
    out: Dict[tuple, "np.ndarray"] = {}
    for g in groups:
        widths = {spec.layers[i].filters for i in g}
        assert len(widths) == 1, (
            f"tied group {g} mixes filter counts {widths} — the cfg "
            "channel validation should have rejected this network")
        out[tuple(g)] = np.sum([sc[i] for i in g], axis=0)
    return out


def tied_group_keep_sets(params: Params, spec: NetworkSpec,
                         fraction: float, skip: Sequence[int] = (),
                         criterion: str = "l1") -> Dict[int, "np.ndarray"]:
    """Group-uniform structured pruning of shortcut-TIED convs: ONE
    shared keep-set per tied group, ranked by the group-SUM of the
    per-filter scores.

    The default protection rule (graph.protected_conv_indices) leaves
    residual identity paths unpruned — the conservative option of
    Li et al. 2017 §4.2 for ResNet-style graphs. This is the paper's
    aggressive alternative: prune the identity path's channels too, but
    IDENTICALLY across the whole tied group so every [shortcut] add
    stays channel-aligned (compress/repack.py validates exactly that
    invariant and fails loudly on a violation). Groups containing a
    head-producing conv (decode contract) or an explicit ``skip`` conv
    stay fully protected.

    Scores are the same per-filter criteria as the untied path
    (``l1`` | ``bn_gamma`` | ``fpgm``); the group rank key is the
    group-summed score from ``tied_group_scores_device``.
    """
    out: Dict[int, "np.ndarray"] = {}
    for g, group_score in tied_group_scores_device(
            params, spec, criterion=criterion, skip=skip).items():
        keep = _keep_from_scores(group_score, fraction)
        for i in g:
            out[i] = keep
    return out


def l1_filter_keep_sets_scheduled(params: Params, spec: NetworkSpec,
                                  fractions: Dict[int, float],
                                  default: float = 0.0,
                                  skip: Sequence[int] = (),
                                  criterion: str = "l1"
                                  ) -> Dict[int, "np.ndarray"]:
    """PER-LAYER drop fractions (Li et al. 2017 §4: layers differ wildly
    in pruning sensitivity, so the paper prunes each layer by its own
    measured-safe fraction rather than uniformly). ``fractions`` maps
    conv layer index -> drop fraction; unlisted prunable convs use
    ``default``. Same one-device-program scoring as the uniform path;
    pair with tools/sensitivity_scan.py to choose the schedule.

    Balance-constrainable CSP grouped-route source convs
    (csp_constrainable_indices) are schedulable too: their per-layer
    fraction is applied PER SPLIT BLOCK (same count dropped from each
    block — the balanced form the repacked slice requires), so a
    sensitivity schedule / discovered --target-flops schedule covers
    the whole yolov4-tiny graph instead of protecting the CSP sources
    (VERDICT r4 Missing #5)."""
    for i in fractions:
        # range-check before indexing: a bad index must surface as the
        # same ValueError every other malformed schedule raises, not an
        # IndexError traceback (negative indices would silently alias
        # from the end, so reject those too)
        if not 0 <= i < len(spec.layers):
            raise ValueError(
                f"conv index {i} out of range [0, {len(spec.layers) - 1}]")
        if not isinstance(spec.layers[i], ConvLayer):
            raise ValueError(f"layer {i} is not a conv layer")
    scores = filter_scores_device(params, spec, criterion=criterion,
                                  skip=skip)
    csp_scores = csp_balanced_scores_device(params, spec,
                                            criterion=criterion, skip=skip)
    unknown = set(fractions) - set(scores) - set(csp_scores)
    if unknown:
        raise ValueError(
            f"fractions given for non-prunable conv indices {sorted(unknown)}"
            " (head-producing, shortcut-tied, skipped and multi-provenance "
            "grouped-route convs are protected — compress/graph.py)")
    out = {i: _keep_from_scores(s, fractions.get(i, default))
           for i, s in scores.items()}
    out.update({i: csp_balanced_keep_from_scores(s, parts,
                                                 fractions.get(i, default))
                for i, (parts, s) in csp_scores.items()})
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
