"""Structured channel repack (SURVEY.md §3.3, §7.4.1; BASELINE.json:5,9:
"physically repacks pruned channels into slimmed dense convs so sparsity
converts to real TPU speedup").

Given per-conv keep-sets (from L1 filter ranking), emit a *smaller dense*
network: a rewritten NetworkSpec with reduced filter counts and a params
pytree with sliced tensors. The correctness trap is keep-set propagation
through the graph (SURVEY.md §7.4.1):

* conv:     w[:, :, in_keep, :][:, :, :, out_keep]; BN rows [out_keep]
* maxpool:  passes the keep-set through unchanged
* route:    concatenates source keep-sets with the *original* channel
            offsets of each source
* reorg /s: input keep K over C channels -> output keep
            {s2*C + c : s2 in [0, s*s), c in K} (block-major ordering of
            space-to-depth; enumerating s2-major with K ascending keeps the
            keep-set sorted, matching the physically sliced reorg output)
* shortcut: (YOLOv3) the residual add requires both inputs to carry the
            SAME keep-set — validated here, guaranteed by the default
            protection rule (compress/graph.py); passes it through
* upsample / [yolo]: spatial / head pass-through, keep-set unchanged

The invariant (tested): slimmed_forward(x) == masked_forward(x) exactly,
where masked mode multiplies each pruned conv's *post-activation* output by
the 0/1 channel mask (so dropped channels contribute exact zeros
downstream — see models/darknet.py channel_masks).

Because channel counts change, the slimmed spec is a new static
architecture: XLA compiles a fresh program per prune round (cached by
channel signature via jit's normal cache on shapes).
"""

from __future__ import annotations

import copy
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.models.cfg import (
    ConvLayer, MaxPoolLayer, NetworkSpec, RegionLayer, ReorgLayer, RouteLayer,
    ShortcutLayer, UpsampleLayer, YoloLayer, out_channels,
)
from modelcompression_tpu.models.darknet import Params, conv_key


def propagate_keep_sets(spec: NetworkSpec,
                        keep_sets: Dict[int, np.ndarray]
                        ) -> Tuple[Dict[int, np.ndarray],
                                   Dict[int, np.ndarray]]:
    """Walk the graph computing, for every conv layer i:
      in_keep[i]  — kept input-channel indices (in original coordinates)
      out_keep[i] — kept output-filter indices (original coordinates)

    ``keep_sets`` maps conv layer index -> kept filter indices; convs not
    present keep all filters.
    """
    orig_out = out_channels(spec)
    in_keep: Dict[int, np.ndarray] = {}
    out_keep: Dict[int, np.ndarray] = {}
    # current keep-set flowing along the main path, in original coords
    cur = np.arange(spec.net.channels)
    # per-layer output keep-set (original coords of that layer's channels)
    layer_keep: List[np.ndarray] = []
    for i, l in enumerate(spec.layers):
        if isinstance(l, ConvLayer):
            in_keep[i] = cur
            if i in keep_sets:
                cur = np.asarray(keep_sets[i], np.int64)
            else:
                cur = np.arange(l.filters)
            out_keep[i] = cur
        elif isinstance(l, MaxPoolLayer):
            pass
        elif isinstance(l, RouteLayer):
            parts = []
            off = 0
            for a in l.layers:
                if l.groups > 1:
                    # CSP split: the route takes slice
                    # [group_id*C/groups, (group_id+1)*C/groups) of the
                    # LIVE tensor. The slice boundary moves with the
                    # live channel count, so the source's keep-set must
                    # be split-BALANCED (same count kept per block —
                    # criteria.csp_balanced_keep_sets builds exactly
                    # these); then the repacked slice equals the kept
                    # subset of the original slice (kept channels stay
                    # ascending, so the repacked block boundary lands
                    # between blocks). Validate so a hand-built
                    # unbalanced keep-set fails loudly instead of
                    # silently re-slicing.
                    src_c = orig_out[a]
                    g = src_c // l.groups
                    k = np.asarray(layer_keep[a], np.int64)
                    counts = [int(((k >= p * g) & (k < (p + 1) * g)).sum())
                              for p in range(l.groups)]
                    if len(set(counts)) != 1:
                        raise ValueError(
                            f"route at layer {i} has groups={l.groups} "
                            f"but its source layer {a}'s keep-set is "
                            f"not split-balanced (kept per block: "
                            f"{counts}) — the grouped slice would "
                            f"select different channels after repack "
                            f"(compress/graph.csp_split_constraints)")
                    lo = l.group_id * g
                    sel = k[(k >= lo) & (k < lo + g)] - lo
                    parts.append(sel + off)
                    off += g
                else:
                    parts.append(layer_keep[a] + off)
                    off += orig_out[a]
            cur = np.concatenate(parts)
        elif isinstance(l, ReorgLayer):
            s2 = l.stride * l.stride
            # source channel count BEFORE slicing is the original count of
            # the producing layer; cur holds kept indices into it
            src_c = orig_out[i - 1]
            cur = np.concatenate([k * src_c + np.sort(cur)
                                  for k in range(s2)])
        elif isinstance(l, ShortcutLayer):
            # residual add: channel k of the slimmed prev tensor is added
            # to channel k of the slimmed `from` tensor, so the two
            # keep-sets must be IDENTICAL (same original coordinates, same
            # ascending order) or the slimmed add silently misaligns.
            # The default protection rule (compress/graph.py
            # protected_conv_indices) keeps every shortcut-tied conv
            # unpruned, which trivially satisfies this; a hand-built
            # keep-set that violates the tie must fail loudly here.
            other = layer_keep[l.from_layer]
            if not np.array_equal(cur, other):
                raise ValueError(
                    f"shortcut at layer {i}: keep-set mismatch between its "
                    f"two inputs (prev keeps {len(cur)} channels, layer "
                    f"{l.from_layer} keeps {len(other)}"
                    + ("" if len(cur) != len(other) else
                       " — same count but different channels")
                    + "); shortcut-tied convs must share one keep-set "
                    "(compress/graph.py tied_conv_groups)")
            # output channels carry the shared keep-set through unchanged
        elif isinstance(l, (RegionLayer, UpsampleLayer, YoloLayer)):
            pass  # spatial / head pass-through: channel identity unchanged
        layer_keep.append(cur)
    return in_keep, out_keep


def repack(spec: NetworkSpec, params: Params,
           keep_sets: Dict[int, np.ndarray]
           ) -> Tuple[NetworkSpec, Params]:
    """Produce the slimmed (spec, params) pair."""
    keep_sets = {i: np.sort(np.asarray(k, np.int64))
                 for i, k in keep_sets.items()}
    in_keep, out_keep = propagate_keep_sets(spec, keep_sets)

    new_spec = copy.deepcopy(spec)
    for i, l in enumerate(new_spec.layers):
        if isinstance(l, ConvLayer):
            l.filters = int(len(out_keep[i]))
    # recompute in_channels for the slimmed widths
    from modelcompression_tpu.models.cfg import _resolve_channels
    _resolve_channels(new_spec)

    # host numpy slicing: repack is a one-shot architecture change, and
    # per-layer device gathers would compile one XLA program per conv shape
    # (minutes of compile on a remote-compile path). Callers re-device-put
    # the slimmed pytree.
    new_params: Params = {}
    for i, l in enumerate(spec.layers):
        if not isinstance(l, ConvLayer):
            continue
        p = params[conv_key(i)]
        ik = np.asarray(in_keep[i])
        ok = np.asarray(out_keep[i])
        w = np.asarray(p["w"])
        q = {"w": np.ascontiguousarray(w[:, :, ik, :][:, :, :, ok])}
        for name in ("bias", "gamma", "beta", "mean", "var"):
            if name in p:
                q[name] = np.asarray(p[name])[ok]
        new_params[conv_key(i)] = q
    return new_spec, new_params


def channel_masks_from_keep(spec: NetworkSpec,
                            keep_sets: Dict[int, np.ndarray]
                            ) -> Dict[int, jnp.ndarray]:
    """0/1 post-activation channel masks equivalent to the repack — the
    masked twin used for fine-tuning before physical slicing and for the
    slimmed==masked equivalence test."""
    masks = {}
    for i, keep in keep_sets.items():
        l = spec.layers[i]
        assert isinstance(l, ConvLayer)
        m = np.zeros((l.filters,), np.float32)
        m[np.asarray(keep, np.int64)] = 1.0
        masks[i] = jnp.asarray(m)
    return masks


def uniform_filter_fraction_keep_sets(spec: NetworkSpec, params: Params,
                                      fraction: float, skip=(),
                                      criterion: str = "l1",
                                      tied: str = "protect"
                                      ) -> Dict[int, np.ndarray]:
    """Convenience: filter keep-sets at one drop fraction for all
    prunable convs (head-producing convs always protected —
    compress/graph.py). ``criterion``: ``l1`` (Li et al. 2017),
    ``bn_gamma`` (Liu et al. 2017 network slimming) or ``fpgm``.

    ``tied`` picks the residual-graph policy (Li et al. §4.2's two
    ResNet options): ``protect`` (default) leaves shortcut-tied convs
    unpruned; ``group`` prunes each tied group with ONE shared keep-set
    ranked by group-summed scores (criteria.tied_group_keep_sets) — the
    aggressive recipe that slims the identity paths too."""
    from modelcompression_tpu.compress.criteria import (
        csp_balanced_keep_sets, l1_filter_keep_sets, tied_group_keep_sets,
    )
    if tied not in ("protect", "group"):
        raise ValueError(f"tied must be 'protect' or 'group', got {tied!r}")
    sets = dict(l1_filter_keep_sets(params, spec, fraction, skip=skip,
                                    criterion=criterion))
    # CSP grouped-route source convs prune with split-BALANCED keep-sets
    # (same count dropped per split block, so the repacked slice stays
    # exact — criteria.csp_balanced_keep_sets); empty for graphs without
    # grouped routes, so the classic families are unchanged
    sets.update(csp_balanced_keep_sets(params, spec, fraction, skip=skip,
                                       criterion=criterion))
    if tied == "group":
        sets.update(tied_group_keep_sets(params, spec, fraction, skip=skip,
                                         criterion=criterion))
    return {i: np.asarray(k) for i, k in sets.items()}
