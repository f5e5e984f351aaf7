"""Channel-provenance analysis for structured pruning on branchy graphs.

YOLOv2's graph is a chain with one route/reorg join, so "protect the last
conv" was enough. YOLOv3 adds two hazards for structured (filter) pruning:

* [shortcut] residual adds require BOTH inputs to carry the SAME channel
  keep-set, or the slimmed add misaligns. Residual chains tie whole groups
  of convs transitively (every block output in a Darknet-53 stage feeds the
  next block's add).
* multiple detection heads: EVERY head-producing conv's filter count is a
  decode contract (A*(5+C)), not just the last conv's.

This module computes that provenance generically from the spec:

``channel_source_convs``  — which convs' filter dims define a layer's
                            output channels.
``tied_conv_groups``      — conv groups coupled by shortcut adds.
``protected_conv_indices``— the default no-prune set: head producers plus
                            every shortcut-tied conv (the Li et al. 2017
                            ResNet recipe §4.2: prune only the internal
                            convs of residual blocks, leaving the identity
                            path's channel count intact).

Pruning criteria (compress/criteria.py, compress/taylor.py) use
``protected_conv_indices`` so the same one-program scoring works for both
families; repack (compress/repack.py) independently VALIDATES the shortcut
keep-set equality so a hand-built keep-set that violates the tie fails
loudly instead of producing a misaligned add.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Set

from modelcompression_tpu.models.cfg import (
    ConvLayer, MaxPoolLayer, NetworkSpec, RegionLayer, ReorgLayer,
    RouteLayer, ShortcutLayer, UpsampleLayer, YoloLayer,
)


def channel_source_convs(spec: NetworkSpec) -> List[FrozenSet[int]]:
    """For every layer, the set of conv indices whose FILTER dimension
    determines that layer's output-channel identity.

    conv -> itself; spatial ops (pool/upsample/reorg) and pass-through
    heads inherit their input's sources; shortcut unions both addends;
    route unions its parts. The network input has no conv source
    (empty set) — a shortcut from the raw input would be unprunable
    anyway."""
    sources: List[FrozenSet[int]] = []
    prev: FrozenSet[int] = frozenset()
    for i, l in enumerate(spec.layers):
        if isinstance(l, ConvLayer):
            cur = frozenset((i,))
        elif isinstance(l, (MaxPoolLayer, ReorgLayer, UpsampleLayer,
                            RegionLayer, YoloLayer)):
            cur = prev
        elif isinstance(l, ShortcutLayer):
            cur = prev | sources[l.from_layer]
        elif isinstance(l, RouteLayer):
            cur = frozenset().union(*(sources[a] for a in l.layers))
        else:  # pragma: no cover - new layer types must be classified here
            raise TypeError(f"unhandled layer type {type(l).__name__}")
        sources.append(cur)
        prev = cur
    return sources


def tied_conv_groups(spec: NetworkSpec) -> List[Set[int]]:
    """Conv groups whose output-filter keep-sets MUST be identical because
    a [shortcut] adds them channel-for-channel. Transitively merged: in a
    Darknet-53 stage, the downsample conv and every block's second conv
    form ONE group. Returns only groups of size >= 2, sorted by smallest
    member."""
    sources = channel_source_convs(spec)
    groups: List[Set[int]] = []
    for i, l in enumerate(spec.layers):
        if not isinstance(l, ShortcutLayer):
            continue
        tie = set(sources[i - 1]) | set(sources[l.from_layer])
        merged = [g for g in groups if g & tie]
        for g in merged:
            tie |= g
            groups.remove(g)
        groups.append(tie)
    return sorted((g for g in groups if len(g) >= 2), key=min)


def csp_split_constraints(spec: NetworkSpec) -> Dict[int, int]:
    """Split-balance constraints from GROUPED [route]s (CSP, yolov4-
    tiny): ``{conv_idx: n_parts}`` — the conv's keep-set must drop the
    SAME number of filters from each of its ``n_parts`` contiguous
    channel blocks.

    Why: the slice boundary ``group_id * C/groups`` is computed from the
    LIVE channel count. A split-BALANCED keep-set makes the repacked
    tensor's slice exactly the kept subset of the original slice (kept
    channels stay in ascending original order, so the repacked block
    boundary lands between the halves); any other keep-set silently
    moves the boundary and changes which channels the split selects.

    Only convs that are the SOLE channel source of every grouped-route
    input they feed are constrainable this way; a grouped route slicing
    a multi-conv tensor (e.g. a concat) keeps full protection instead
    (``grouped_route_protected_convs``). A conv feeding grouped routes
    with different ``groups`` gets the LCM."""
    import math
    sources = channel_source_convs(spec)
    out: Dict[int, int] = {}
    for i, l in enumerate(spec.layers):
        if isinstance(l, RouteLayer) and l.groups > 1:
            for a in l.layers:
                src = sources[a]
                if len(src) != 1:
                    continue  # multi-conv provenance -> protected
                (ci,) = src
                out[ci] = (l.groups if ci not in out
                           else out[ci] * l.groups
                           // math.gcd(out[ci], l.groups))
    return out


def grouped_route_protected_convs(spec: NetworkSpec) -> Set[int]:
    """Grouped-route source convs that CANNOT be split-balanced (their
    sliced tensor has multi-conv provenance) — these stay fully
    protected. Single-conv sources are handled by the balance
    constraint (``csp_split_constraints``) instead."""
    sources = channel_source_convs(spec)
    out: Set[int] = set()
    for i, l in enumerate(spec.layers):
        if isinstance(l, RouteLayer) and l.groups > 1:
            for a in l.layers:
                if len(sources[a]) != 1:
                    out |= sources[a]
    return out


def grouped_route_source_convs(spec: NetworkSpec) -> Set[int]:
    """All convs feeding a GROUPED [route] (balanceable or not) — the
    set excluded from PLAIN per-filter score maps. Balance-constrainable
    members (criteria.csp_constrainable_indices) are pruned separately
    with split-BALANCED keep-sets on every path: the uniform fraction
    (criteria.csp_balanced_keep_sets), per-layer schedules
    (l1_filter_keep_sets_scheduled) and the FLOP-budget allocator
    (flops.flop_targeted_keep_sets csp_scores units)."""
    sources = channel_source_convs(spec)
    out: Set[int] = set()
    for i, l in enumerate(spec.layers):
        if isinstance(l, RouteLayer) and l.groups > 1:
            for a in l.layers:
                out |= sources[a]
    return out


def head_producer_convs(spec: NetworkSpec) -> Set[int]:
    """Convs whose filter count is a decode contract: the producers of
    every [region]/[yolo] head's input map (A*(5+C) channels)."""
    sources = channel_source_convs(spec)
    out: Set[int] = set()
    for h in spec.head_indices():
        out |= sources[h - 1] if h > 0 else set()
    return out


def protected_conv_indices(spec: NetworkSpec) -> Set[int]:
    """The default structurally-unprunable set: head producers plus every
    shortcut-tied conv plus every conv feeding a grouped route (the CSP
    split's slice boundary depends on the live channel count). For
    YOLOv2-family chains this reduces to exactly the old rule
    ({last conv}); for YOLOv3 it protects the three head convs and the
    residual identity paths; for yolov4-tiny it additionally protects
    the CSP-split sources."""
    out = head_producer_convs(spec) | grouped_route_source_convs(spec)
    for g in tied_conv_groups(spec):
        out |= g
    return out


def prunable_conv_indices(spec: NetworkSpec) -> List[int]:
    """Convs eligible for structured filter pruning under the default
    protection rule, in network order."""
    protected = protected_conv_indices(spec)
    return [i for i in spec.conv_indices() if i not in protected]
