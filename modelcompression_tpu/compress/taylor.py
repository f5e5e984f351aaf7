"""Taylor-expansion filter criterion (Molchanov et al. 2017, "Pruning
Convolutional Neural Networks for Resource Efficient Inference").

First-order estimate of the loss change from removing filter j:

    theta_j = | sum_{batch, spatial} a_j * dL/da_j |

where ``a_j`` is filter j's post-activation output. The data-free criteria
(L1 weight norm, BN |gamma| — compress/criteria.py) rank filters by what
they *are*; Taylor ranks them by what the LOSS would lose, measured on real
training batches — the criterion Molchanov showed dominates weight norms on
transfer/fine-tune tasks (PAPERS.md retrieval class).

TPU-first formulation: instead of capturing intermediate activations (the
reference-class torch approach hooks every module), we differentiate with
respect to **all-ones per-filter gates** threaded through the existing
``channel_masks`` hook of the forward pass (models/darknet.py:207-212 —
post-activation channel multiplier). With gate g_j == 1 the chain rule gives

    dL/dg_j = sum_{batch, spatial} a_j * dL/da_j

exactly — one ``jax.grad`` over a (num_prunable_convs,) pytree of tiny
vectors, no hooks, no activation storage beyond what autodiff already keeps.
The whole scoring pass (forward + backward + |.| + accumulate) is ONE XLA
program reused across batches (remote compile is 20-50 s per program —
CLAUDE.md), with score totals living on device until a single final readback.

Scores are layer-wise L2-normalized (Molchanov §3.3) before being returned;
per-layer rank selection is normalization-invariant, but the normalized
scores are comparable across layers for reporting and scheduled pruning.
The per-element 1/M average of the paper is a per-layer constant and
cancels under the same normalization, so it is omitted.

``second_moment=True`` selects the 2019 revision's importance
(Molchanov et al., "Importance Estimation for Neural Network Pruning"):
accumulate (dL/dg_j)^2 per minibatch instead of |dL/dg_j| — the squared
form penalizes consistently-important filters less noisily when gradients
change sign across batches. Same program shape, one extra multiply.
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.core.precision import BITMATCH, Precision
from modelcompression_tpu.models.cfg import NetworkSpec
from modelcompression_tpu.models.darknet import Params, conv_key, forward


def taylor_gate_indices(spec: NetworkSpec,
                        skip: Sequence[int] = ()) -> Tuple[int, ...]:
    """Prunable conv indices for Taylor scoring: every conv except the
    structurally protected set (compress/graph.py: head-producing convs,
    whose channel count is the decode contract, plus shortcut-tied convs)
    and any explicitly skipped layer — the same protection rule as the
    L1 / bn_gamma / fpgm criteria (compress/criteria.py)."""
    from modelcompression_tpu.compress.graph import protected_conv_indices
    conv_idx = spec.conv_indices()
    protected = set(skip) | protected_conv_indices(spec)
    return tuple(i for i in conv_idx if i not in protected)


def _make_score_step(spec: NetworkSpec, precision: Precision,
                     second_moment: bool = False):
    """One jitted program: forward (train-mode BN, gated channels) +
    detection loss ([region] or multi-head [yolo]) + grad w.r.t. the
    gates + |.| (or squared) accumulate into totals."""
    from modelcompression_tpu.train.yolo_loss import detection_loss

    @jax.jit
    def score_step(params, gates, totals, images, targets, seen):
        def loss_fn(g):
            x = images.astype(jnp.float32) / 255.0
            raw = forward(params, x, spec, precision=precision,
                          train_stats=True, channel_masks=g)
            return detection_loss(raw, targets, spec, seen).loss

        grads = jax.grad(loss_fn)(gates)
        # gate == 1, so dL/dg_j is already sum(a_j * dL/da_j); Molchanov
        # 2017 takes |.| per minibatch (2019: the square), then averages
        # across minibatches
        def acc(g):
            g = g.astype(jnp.float32)
            return g * g if second_moment else jnp.abs(g)

        return {i: totals[i] + acc(g) for i, g in grads.items()}

    return score_step


def _raw_gate_scores(params: Params, spec: NetworkSpec,
                     gate_idx: Sequence[int],
                     batches: Iterable[Tuple[np.ndarray, np.ndarray]],
                     seen: int, precision: Precision,
                     second_moment: bool) -> Dict[int, np.ndarray]:
    """Batch-averaged UN-normalized gate scores for the given conv
    indices: the shared accumulation pass behind both public score
    functions (one program, device totals, one readback)."""
    gates = {i: jnp.ones((spec.layers[i].filters,), jnp.float32)
             for i in gate_idx}
    totals = {i: jnp.zeros((spec.layers[i].filters,), jnp.float32)
              for i in gate_idx}
    step = _make_score_step(spec, precision, second_moment=second_moment)
    seen_arr = jnp.asarray(seen, jnp.int32)
    n = 0
    for images, targets in batches:
        totals = step(params, gates, totals,
                      jnp.asarray(images), jnp.asarray(targets), seen_arr)
        n += 1
    if n == 0:
        raise ValueError("taylor scoring needs at least one batch")
    host = jax.device_get(totals)
    return {i: np.asarray(s, np.float32) / n for i, s in host.items()}


def _l2_normed(s: np.ndarray) -> np.ndarray:
    norm = float(np.sqrt(np.sum(s * s)))
    return s / norm if norm > 0 else s


def taylor_filter_scores_device(
        params: Params, spec: NetworkSpec,
        batches: Iterable[Tuple[np.ndarray, np.ndarray]],
        skip: Sequence[int] = (),
        seen: int = 0,
        precision: Precision = BITMATCH,
        second_moment: bool = False) -> Dict[int, np.ndarray]:
    """Taylor filter scores over ``batches`` of (uint8 NHWC images,
    (B, M, 5) padded targets) — the BatchLoader batch shape.

    Accumulates on device across all batches (one program, one final
    readback) and returns {conv_layer_idx: (filters,) float32 scores},
    layer-wise L2-normalized. Raises if ``batches`` is empty — a silent
    all-zero score would prune by tie-order, which is never intended.
    """
    raw = _raw_gate_scores(params, spec, taylor_gate_indices(spec, skip),
                           batches, seen, precision, second_moment)
    return {i: _l2_normed(s) for i, s in raw.items()}


def taylor_scores_with_groups(
        params: Params, spec: NetworkSpec,
        batches: Iterable[Tuple[np.ndarray, np.ndarray]],
        skip: Sequence[int] = (),
        seen: int = 0,
        precision: Precision = BITMATCH,
        second_moment: bool = False
        ) -> Tuple[Dict[int, np.ndarray], Dict[tuple, np.ndarray]]:
    """Taylor scores for the untied prunable convs AND the shortcut-tied
    groups, in ONE scoring pass: ``(untied_scores, group_scores)``.

    Gating is a measurement, not a prune — a per-member all-ones gate on
    a tied conv leaves every [shortcut] add intact, so the tie
    constraint only binds at keep-set construction. The group score is
    the filter-for-filter SUM of the member gate gradients (first-order
    loss change of removing the channel from EVERY member at once —
    the same total-derivative argument as the data-free group sum in
    criteria.tied_group_scores_device), L2-normalized as one unit;
    untied scores keep the per-layer normalization. Groups containing a
    head-producing or ``skip`` conv stay fully protected.
    """
    from modelcompression_tpu.compress.graph import (
        grouped_route_source_convs, head_producer_convs, tied_conv_groups,
    )
    protected = (head_producer_convs(spec)
                 | grouped_route_source_convs(spec) | set(skip))
    groups = [tuple(sorted(g)) for g in tied_conv_groups(spec)
              if not (g & protected)]
    untied_idx = taylor_gate_indices(spec, skip)
    members = tuple(i for g in groups for i in g)
    raw = _raw_gate_scores(params, spec, tuple(untied_idx) + members,
                           batches, seen, precision, second_moment)
    untied = {i: _l2_normed(raw[i]) for i in untied_idx}
    group_scores = {
        g: _l2_normed(np.sum([raw[i] for i in g], axis=0)) for g in groups}
    return untied, group_scores


def taylor_scores_all(
        params: Params, spec: NetworkSpec,
        batches: Iterable[Tuple[np.ndarray, np.ndarray]],
        skip: Sequence[int] = (),
        seen: int = 0,
        precision: Precision = BITMATCH,
        second_moment: bool = False
        ) -> Tuple[Dict[int, np.ndarray], Dict[tuple, np.ndarray],
                   Dict[int, tuple]]:
    """The FLOP-budget allocator's full Taylor input set in ONE scoring
    pass: ``(untied_scores, tied_group_scores, csp_scores)`` where
    ``csp_scores`` is keyed ``{conv_idx: (n_parts, (O,) scores)}`` for
    the balance-constrainable CSP grouped-route source convs
    (criteria.csp_constrainable_indices) — gating is a measurement, not
    a prune, so an all-ones gate on a CSP source disturbs neither the
    split slice nor the graph (same argument as the tied-group gates).
    Feeds ``flops.flop_targeted_keep_sets(scores, group_scores=...,
    csp_scores=...)`` so --tied group x --target-flops x balanced-CSP
    compose under the taylor criterion like the data-free ones."""
    from modelcompression_tpu.compress.criteria import (
        csp_constrainable_indices,
    )
    from modelcompression_tpu.compress.graph import (
        grouped_route_source_convs, head_producer_convs, tied_conv_groups,
    )
    protected = (head_producer_convs(spec)
                 | grouped_route_source_convs(spec) | set(skip))
    groups = [tuple(sorted(g)) for g in tied_conv_groups(spec)
              if not (g & protected)]
    constraints = csp_constrainable_indices(spec, skip)
    untied_idx = taylor_gate_indices(spec, skip)
    members = tuple(i for g in groups for i in g)
    raw = _raw_gate_scores(
        params, spec, tuple(untied_idx) + members + tuple(constraints),
        batches, seen, precision, second_moment)
    untied = {i: _l2_normed(raw[i]) for i in untied_idx}
    group_scores = {
        g: _l2_normed(np.sum([raw[i] for i in g], axis=0)) for g in groups}
    csp_scores = {i: (parts, _l2_normed(raw[i]))
                  for i, parts in constraints.items()}
    return untied, group_scores, csp_scores


def taylor_filter_keep_sets(
        params: Params, spec: NetworkSpec,
        batches: Iterable[Tuple[np.ndarray, np.ndarray]],
        fraction: float,
        skip: Sequence[int] = (),
        seen: int = 0,
        precision: Precision = BITMATCH,
        second_moment: bool = False,
        tied: str = "protect") -> Dict[int, np.ndarray]:
    """Keep-sets dropping the floor(fraction*O) lowest-Taylor-score filters
    per prunable conv — same rank/tie semantics as the L1 path
    (compress/criteria.py), drop-in for repack().

    ``tied='group'`` additionally prunes each shortcut-tied group with
    ONE shared keep-set ranked by the group-summed gate gradients
    (``taylor_scores_with_groups``) — the Taylor twin of
    ``criteria.tied_group_keep_sets``, same single scoring pass."""
    from modelcompression_tpu.compress.criteria import (
        _keep_from_scores, keep_sets_from_scores,
    )
    if tied not in ("protect", "group"):
        raise ValueError(f"tied must be 'protect' or 'group', got {tied!r}")
    if tied == "group":
        untied, group_scores = taylor_scores_with_groups(
            params, spec, batches, skip=skip, seen=seen,
            precision=precision, second_moment=second_moment)
        keep = keep_sets_from_scores(untied, fraction)
        for g, s in group_scores.items():
            ks = _keep_from_scores(np.asarray(s), fraction)
            for i in g:
                keep[i] = ks
        return keep
    scores = taylor_filter_scores_device(params, spec, batches, skip=skip,
                                         seen=seen, precision=precision,
                                         second_moment=second_moment)
    return keep_sets_from_scores(scores, fraction)
