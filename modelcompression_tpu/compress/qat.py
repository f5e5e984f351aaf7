"""Quantization-aware fine-tuning (QAT) for the int8 deployment path.

PTQ (quantize.py) calibrates scales on a frozen model; when the rounding
noise costs accuracy, QAT fine-tunes WITH the deployment's quantization
simulated inside the training forward (fake-quant + straight-through
estimator), so the weights learn to sit well on representable grid
points. This is the quantization axis's analogue of the prune->fine-tune
recovery workflow (SURVEY.md §3.4; BASELINE.json:9's "short fine-tune"
applied to the second compression axis).

TPU-first: fake-quant is elementwise (scale/round/clip) and fuses into
the conv epilogues, so the QAT step stays ONE XLA program like the
regular train step (train/train_step.py) — the QATSpec only contributes
compile-time scalar constants, never a host round-trip.

Semantics mirror ``forward_quantized`` exactly:

* **Activations**: per-tensor STATIC scales from calibration, with the
  same scale-group merging across pool/reorg/route (``_scale_groups``)
  the deployed int8 program uses, held fixed through training. Each
  int8 conv's input is fake-quanted on its ``in_scale`` grid and its
  post-activation output on its ``out_scale`` grid; fake-quant is
  idempotent on its own grid, so contiguous int8 regions, islands and
  mixed routes all reproduce the deployed boundary placement.
* **Weights**: per-output-channel symmetric grids, DYNAMIC (recomputed
  from |w| at every step) because the weights move during training.
  Per-channel symmetric fake-quant of the UNfolded weight is
  grid-equivalent to quantizing the BN-folded weight — folding scales
  each output channel by gamma*rsqrt(var+eps), which rescales that
  channel's absmax grid by the same factor — so training with BN live
  still rehearses the deployed rounding pattern (the residual gap is
  batch-vs-running BN statistics, the usual QAT approximation).

Workflow::

    qat = qat_spec_from_batches(params, spec, calib_batches,
                                int8_layers=int8_layers_auto(spec))
    config = TrainConfig.from_spec(spec, qat=qat)
    ...train...
    qparams = quantize_qat(state["params"], spec, qat)   # deploy
    y = forward_quantized(qparams, x, spec)

CLI surface: ``finetune --qat [--qat-layers auto[:K]]``.
"""

from __future__ import annotations

import dataclasses
from typing import FrozenSet, Iterable, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.compress.quantize import (
    QParams, _layer_out_scales, _resolve_int8_set, collect_act_absmax,
    quantize_network,
)
from modelcompression_tpu.models.cfg import NetworkSpec
from modelcompression_tpu.models.darknet import Params, fold_batchnorm


@dataclasses.dataclass(frozen=True)
class QATSpec:
    """Static quantization plan for a QAT fine-tune.

    ``int8``: conv layer indices trained with fake-quant (the deployment
    subset — see ``quantize.int8_layers_auto``). ``in_scale`` /
    ``out_scale``: per-conv activation grids (out_scale absent for
    head-producing convs, whose raw maps stay float in deployment).
    ``act_absmax`` / ``input_absmax`` keep the raw calibration so
    ``quantize_qat`` can export the deployed int8 pytree with EXACTLY
    the grids training rehearsed.
    """

    int8: FrozenSet[int]
    in_scale: Mapping[int, float]
    out_scale: Mapping[int, float]
    act_absmax: Tuple[float, ...]
    input_absmax: float


def fake_quant(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Straight-through fake quantization on a fixed symmetric int8 grid.

    Forward: dequant(quant(x)) = clip(round(x/scale), ±127) * scale,
    computed in f32. Backward: identity (the STE) — round/clip have
    zero/undefined gradients, and passing the cotangent straight through
    is the standard estimator that makes the quantized loss trainable.
    """
    xf = x.astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0) * scale
    return (xf + jax.lax.stop_gradient(q - xf)).astype(x.dtype)


def fake_quant_weight(w: jnp.ndarray) -> jnp.ndarray:
    """STE fake-quant of a conv weight on per-output-channel grids.

    The grid tracks the CURRENT |w| (absmax/127 per channel, exactly
    ``quantize_network``'s rule), recomputed every step under
    stop_gradient — the deployed export then lands on the same grid.
    """
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1)), keepdims=True)
    s = jax.lax.stop_gradient(jnp.maximum(s, 1e-12) / 127.0)
    q = jnp.clip(jnp.round(wf / s), -127.0, 127.0) * s
    return (wf + jax.lax.stop_gradient(q - wf)).astype(w.dtype)


def qat_spec_from_absmax(spec: NetworkSpec,
                         act_absmax: Sequence[float],
                         input_absmax: float,
                         int8_layers: Optional[Iterable[int]] = None
                         ) -> QATSpec:
    """Build the QAT plan from a calibration profile (same inputs as
    ``quantize_network``, same grid derivation)."""
    from modelcompression_tpu.compress.graph import head_producer_convs
    out_scales, input_scale = _layer_out_scales(spec, act_absmax,
                                                input_absmax)
    conv_ids, int8_set = _resolve_int8_set(spec, int8_layers)
    # head producers deploy with no output requant (raw f32 map) — same
    # rule as quantize_network, generalized to multi-head specs
    head_convs = head_producer_convs(spec)
    in_scale, out_scale = {}, {}
    for i in sorted(int8_set):
        in_scale[i] = input_scale if i == 0 else out_scales[i - 1]
        if i not in head_convs:
            out_scale[i] = out_scales[i]
    return QATSpec(int8=frozenset(int8_set), in_scale=in_scale,
                   out_scale=out_scale,
                   act_absmax=tuple(float(a) for a in act_absmax),
                   input_absmax=float(input_absmax))


def qat_spec_from_batches(params: Params, spec: NetworkSpec,
                          batches: Sequence[np.ndarray],
                          int8_layers: Optional[Iterable[int]] = None,
                          quantile: Optional[float] = None) -> QATSpec:
    """Calibrate activation grids (on the BN-folded model — the form
    deployment quantizes) and build the QAT plan in one call.

    ``batches``: float images in [0, 1], NHWC, same preprocessing the
    deployed pipeline sees (the letterboxed canvas).
    """
    folded = fold_batchnorm(params, spec)
    absmax, in_max = collect_act_absmax(folded, spec, batches,
                                        quantile=quantile)
    return qat_spec_from_absmax(spec, absmax, in_max,
                                int8_layers=int8_layers)


def quantize_qat(params: Params, spec: NetworkSpec, qat: QATSpec
                 ) -> QParams:
    """Export the deployed int8 pytree after a QAT fine-tune: BN-fold,
    then quantize with EXACTLY the activation grids training rehearsed
    (weight grids re-derive from the final weights, matching the dynamic
    per-step grids of ``fake_quant_weight``)."""
    folded = fold_batchnorm(params, spec)
    return quantize_network(folded, spec,
                            np.asarray(qat.act_absmax, np.float32),
                            input_absmax=qat.input_absmax,
                            int8_layers=sorted(qat.int8))
