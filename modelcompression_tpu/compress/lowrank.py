"""Low-rank factorization — the framework's FIFTH compression axis
(beyond the reference, which prunes only): replace a k×k conv with a
k×k→r linear conv followed by a 1×1 r→co conv via output-channel SVD
(Denton et al. 2014 / Jaderberg et al. 2014 family; SURVEY.md §2.1
"compression engine" row's extension ledger in docs/PARITY.md).

Math: flatten the HWIO weight W (kh,kw,ci,co) to M (kh·kw·ci, co),
truncate its SVD at rank r, and split M_r = (U_r√S)(√S V_rᵀ). The first
factor becomes the k×k conv's weight (r filters, LINEAR activation, no
BN, zero bias — carrying the original stride/pad); the second becomes a
1×1 conv that inherits the original BN/bias + activation. At full rank
the pair reproduces the original layer to fp roundoff; truncation error
is optimal in Frobenius norm (Eckart–Young).

TPU-first shape: the transform itself is a one-shot HOST operation
(like the codebook/k-means stage — no reason to burn a 20-50 s remote
compile on a one-time SVD), but its OUTPUT is a plain rewritten Darknet
cfg + weights: both convs are standard layers, so the factored model
runs the existing one-program jitted forward/train/eval paths, composes
with every other axis (masks, int8, QAT, distill, sharding), and the
MXU sees two dense matmuls of shapes IT tiles well (kh·kw·ci×r and
r×co). Rank selection is by spectral energy (keep the smallest r whose
singular values carry --energy of ΣS²) with a FLOPs guard: a layer is
factored only when the factored cost is below --max-cost of the
original (r < kh·kw·ci·co / (kh·kw·ci + co) is break-even), so
"factor everything at energy e" never makes the network slower.

Spec surgery: factoring inserts a layer, shifting Darknet layer indices
— every RouteLayer reference is remapped (a reference to the factored
conv points at the SECOND conv, its output-equivalent), and params keys
(conv{i}) are rebuilt on the new numbering.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from modelcompression_tpu.models.cfg import (
    ConvLayer, NetworkSpec, RouteLayer, _resolve_channels,
)
from modelcompression_tpu.models.darknet import Params, conv_key

__all__ = [
    "factor_conv_weight", "rank_for_energy", "breakeven_rank",
    "factor_network", "FactorEntry",
]


def _split_from_svd(u: np.ndarray, s: np.ndarray, vt: np.ndarray,
                    rank: int, shape: Tuple[int, int, int, int]
                    ) -> Tuple[np.ndarray, np.ndarray]:
    kh, kw, ci, co = shape
    if not 1 <= rank <= s.size:
        raise ValueError(f"rank {rank} out of [1, {s.size}]")
    sq = np.sqrt(s[:rank])
    w1 = (u[:, :rank] * sq).reshape(kh, kw, ci, rank).astype(np.float32)
    w2 = (sq[:, None] * vt[:rank]).reshape(1, 1, rank, co).astype(
        np.float32)
    return w1, w2


def factor_conv_weight(w: np.ndarray, rank: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """SVD-split one HWIO weight (kh,kw,ci,co) into (kh,kw,ci,r) and
    (1,1,r,co). Composing the two convs applies the rank-r truncation of
    the original (exact at full rank, Eckart–Young-optimal below it)."""
    kh, kw, ci, co = w.shape
    m = np.asarray(w, np.float64).reshape(kh * kw * ci, co)
    u, s, vt = np.linalg.svd(m, full_matrices=False)
    return _split_from_svd(u, s, vt, rank, (kh, kw, ci, co))


def rank_for_energy(singular_values: np.ndarray, energy: float) -> int:
    """Smallest r whose top-r singular values carry >= energy of ΣS²."""
    if not 0.0 < energy <= 1.0:
        raise ValueError(f"energy must be in (0, 1], got {energy}")
    e = np.cumsum(np.asarray(singular_values, np.float64) ** 2)
    total = e[-1]
    if total == 0.0:
        return 1
    return int(np.searchsorted(e, energy * total - 1e-12) + 1)


def breakeven_rank(layer: ConvLayer) -> float:
    """Rank at which the factored pair costs exactly the original conv
    (in FLOPs and in params — both are linear in r with the same
    coefficients)."""
    kkci = layer.size * layer.size * layer.in_channels
    return kkci * layer.filters / (kkci + layer.filters)


@dataclasses.dataclass
class FactorEntry:
    layer_idx: int          # index in the ORIGINAL spec
    rank: int
    full_rank: int
    energy_kept: float      # fraction of ΣS² retained
    cost_ratio: float       # factored/original FLOPs (= params ratio)


def factor_network(params: Params, spec: NetworkSpec,
                   energy: float = 0.9,
                   ranks: Optional[Dict[int, int]] = None,
                   max_cost: float = 1.0,
                   ) -> Tuple[NetworkSpec, Params, List[FactorEntry]]:
    """Factor every conv where the energy-selected rank passes the cost
    guard; return (new_spec, new_params, report).

    ``ranks`` switches to surgical mode: when given (non-empty), ONLY
    the listed layers are factored, at exactly the given ranks (clamped
    to the spectrum; still subject to the cost guard — pass a large
    ``max_cost`` to force). Layers that fail the guard pass through
    unchanged. The returned spec/params share no mutable state with the
    inputs.
    """
    if ranks is None:
        ranks = {}
    for idx, r in ranks.items():
        if not (0 <= idx < len(spec.layers)
                and isinstance(spec.layers[idx], ConvLayer)):
            raise ValueError(f"--rank index {idx} is not a conv layer")
        if r < 1:
            raise ValueError(
                f"--rank {idx}:{r} — explicit rank must be >= 1 "
                f"(a clamped rank would silently destroy the layer)")

    new_layers: List = []
    new_params: Params = {}
    report: List[FactorEntry] = []
    new_of: Dict[int, int] = {}  # old idx -> new idx of its OUTPUT layer
    for idx, layer in enumerate(spec.layers):
        if isinstance(layer, RouteLayer):
            new_layers.append(RouteLayer(
                layers=tuple(new_of[a] for a in layer.layers),
                groups=layer.groups, group_id=layer.group_id))
            new_of[idx] = len(new_layers) - 1
            continue
        split = None  # (rank, energy_kept, w1, w2)
        if isinstance(layer, ConvLayer) and (not ranks or idx in ranks):
            w = np.asarray(params[conv_key(idx)]["w"], np.float32)
            # ONE full SVD per conv: rank selection and the split use
            # the same decomposition
            u, s, vt = np.linalg.svd(
                w.astype(np.float64).reshape(-1, w.shape[-1]),
                full_matrices=False)
            r = max(1, min(ranks.get(idx, rank_for_energy(s, energy)),
                           s.size))
            if r / breakeven_rank(layer) <= max_cost:
                e2 = float(np.sum(s[:r] ** 2)
                           / max(np.sum(s ** 2), 1e-30))
                split = (r, e2) + _split_from_svd(u, s, vt, r, w.shape)
        if split is not None:
            r, e2, w1, w2 = split
            p = params[conv_key(idx)]
            first = ConvLayer(
                filters=r, size=layer.size, stride=layer.stride,
                pad=layer.pad, batch_normalize=False, activation="linear")
            second = ConvLayer(
                filters=layer.filters, size=1, stride=1, pad=0,
                batch_normalize=layer.batch_normalize,
                activation=layer.activation)
            new_params[conv_key(len(new_layers))] = {
                "w": w1, "bias": np.zeros((r,), np.float32)}
            new_layers.append(first)
            tail = {f: np.array(v, np.float32)  # real copies (contract)
                    for f, v in p.items() if f != "w"}
            new_params[conv_key(len(new_layers))] = {"w": w2, **tail}
            new_layers.append(second)
            report.append(FactorEntry(
                layer_idx=idx, rank=r, full_rank=min(
                    layer.size * layer.size * layer.in_channels,
                    layer.filters),
                energy_kept=e2,
                cost_ratio=r / breakeven_rank(layer)))
        else:
            if isinstance(layer, ConvLayer):
                # np.array (not asarray): the documented no-shared-state
                # contract requires real copies on pass-through too
                new_params[conv_key(len(new_layers))] = {
                    f: np.array(v) for f, v in
                    params[conv_key(idx)].items()}
            new_layers.append(dataclasses.replace(layer))
        new_of[idx] = len(new_layers) - 1

    new_spec = NetworkSpec(net=dataclasses.replace(spec.net),
                           layers=new_layers)
    _resolve_channels(new_spec)
    return new_spec, new_params, report
