"""Functional Darknet/YOLOv2 forward pass — TPU-first (NHWC, jit-friendly).

Design notes (vs the reference's torch ``nn.Module`` graph, SURVEY.md §1.2 L1):

* **Pure function of (params, x)** — the architecture lives in a static
  ``NetworkSpec``; ``forward`` closes over it and is traced once per spec.
  Structured repack produces a *new* spec + sliced params, which recompiles a
  new XLA program (SURVEY.md §7.4.1: treat architectures as static).
* **NHWC layout** with HWIO conv kernels — the native TPU conv layout
  (channels on the 128-lane minor dimension feeds the MXU directly).
  The Darknet ``.weights`` codec (weights_io.py) transposes from OIHW.
* **BN is pre-folded into scale/shift outside the conv** at inference via
  ``fold_batchnorm`` so eval runs conv+affine+leaky as one fused XLA op; for
  training we keep explicit batch statistics (region fine-tune uses batch
  stats like the reference's torch BatchNorm2d).
* Darknet quirks covered (SURVEY.md §7.4.6): maxpool size-2/stride-1 pads
  bottom/right with -inf; ``reorg`` follows the pytorch-yolo2 lineage
  semantics (verified against the torch oracle in tests/oracle/).

Behavioral contract provenance: BASELINE.json:5 (conv forward/backward in
XLA), SURVEY.md Appendix A.1 (architecture).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.core.precision import Precision, BITMATCH
from modelcompression_tpu.models.cfg import (
    ConvLayer, MaxPoolLayer, NetworkSpec, RegionLayer, ReorgLayer, RouteLayer,
    ShortcutLayer, UpsampleLayer, YoloLayer,
)

# Matches torch.nn.BatchNorm2d default (the reference repo class is
# pytorch-yolo2-lineage, SURVEY.md §1.1): y = g*(x-mu)/sqrt(var+eps)+b.
BN_EPS = 1e-5

Params = Dict[str, Dict[str, jnp.ndarray]]


def conv_key(layer_idx: int) -> str:
    return f"conv{layer_idx}"


def init_params(spec: NetworkSpec, rng: jax.Array,
                dtype=jnp.float32) -> Params:
    """He-init conv weights (HWIO); BN gamma=1, beta=0, mean=0, var=1."""
    params: Params = {}
    for i, l in enumerate(spec.layers):
        if not isinstance(l, ConvLayer):
            continue
        rng, k = jax.random.split(rng)
        fan_in = l.in_channels * l.size * l.size
        std = math.sqrt(2.0 / fan_in)
        w = jax.random.normal(
            k, (l.size, l.size, l.in_channels, l.filters), dtype) * std
        p = {"w": w}
        if l.batch_normalize:
            p["gamma"] = jnp.ones((l.filters,), dtype)
            p["beta"] = jnp.zeros((l.filters,), dtype)
            p["mean"] = jnp.zeros((l.filters,), dtype)
            p["var"] = jnp.ones((l.filters,), dtype)
        else:
            p["bias"] = jnp.zeros((l.filters,), dtype)
        params[conv_key(i)] = p
    return params


def _activate(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "leaky":
        return jnp.where(x > 0, x, 0.1 * x)
    if kind == "linear":
        return x
    if kind == "relu":
        return jnp.maximum(x, 0)
    if kind == "logistic":
        return jax.nn.sigmoid(x)
    if kind == "mish":
        # Darknet (YOLOv4): x * tanh(softplus(x)); jax.nn.softplus is the
        # numerically-stable log1p(exp) form darknet's MISH_THRESHOLD
        # branches approximate
        return x * jnp.tanh(jax.nn.softplus(x))
    raise ValueError(f"unsupported activation {kind!r}")


def _conv(x: jnp.ndarray, w: jnp.ndarray, layer: ConvLayer,
          precision: Precision) -> jnp.ndarray:
    pad = layer.padding
    return jax.lax.conv_general_dilated(
        precision.cast_in(x), precision.cast_in(w),
        window_strides=(layer.stride, layer.stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision.conv_precision,
        preferred_element_type=precision.accum_dtype,
    )


def conv_bn_act(x: jnp.ndarray, p: Dict[str, jnp.ndarray], layer: ConvLayer,
                precision: Precision,
                train_stats: bool = False) -> jnp.ndarray:
    """Conv + (BN | bias) + activation. XLA fuses the affine+leaky into the
    conv epilogue; no hand-fusion needed (SURVEY.md build plan §7.2.1)."""
    y = _conv(x, p["w"], layer, precision)
    if layer.batch_normalize:
        if train_stats:
            mu = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.var(y, axis=(0, 1, 2))
        else:
            mu = p["mean"].astype(y.dtype)
            var = p["var"].astype(y.dtype)
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + BN_EPS).astype(y.dtype)
        y = (y - mu) * (p["gamma"].astype(y.dtype) * inv) \
            + p["beta"].astype(y.dtype)
    else:
        y = y + p["bias"].astype(y.dtype)
    y = _activate(y, layer.activation)
    return precision.cast_out(y)


def route_part(t: jnp.ndarray, layer: RouteLayer) -> jnp.ndarray:
    """One route source's contribution: the full tensor (classic route)
    or its CSP group slice (groups/group_id, yolov4-tiny). A STATIC
    channel slice — XLA fuses it into the consumer, no copy
    materializes. Shared by the float forwards and the int8 path so the
    split convention lives in one place."""
    if layer.groups == 1:
        return t
    g = t.shape[-1] // layer.groups
    return t[..., layer.group_id * g:(layer.group_id + 1) * g]


def maxpool(x: jnp.ndarray, layer: MaxPoolLayer) -> jnp.ndarray:
    """Darknet maxpool: out = (in + (size-1) - size)//stride + 1, with the
    window origin offset by -(size-1)//2 (maxpool_layer.c: w_offset =
    -pad/2 in integer math, pad = size-1). Out-of-bounds reads are -inf.

    size=2 gives offset 0 — plain VALID pooling on even inputs, one
    bottom/right pad for Tiny-YOLOv2's size-2/stride-1 pool (SURVEY.md
    §7.4.6). Odd sizes (e.g. 3) center the padding, matching Darknet."""
    k, s = layer.size, layer.stride
    h, w = x.shape[1], x.shape[2]
    pad_total = layer.pad_total  # cfg padding= knob; default size - 1
    pad_begin = pad_total // 2
    out_h = (h + pad_total - k) // s + 1
    out_w = (w + pad_total - k) // s + 1
    pad_h_end = max(0, (out_h - 1) * s + k - h - pad_begin)
    pad_w_end = max(0, (out_w - 1) * s + k - w - pad_begin)
    # NOTE two replacements for the 2x2/2 VALID case were measured and
    # rejected (docs/PERF.md explored-and-rejected): a reshape+axis-max
    # forward twin (neutral in the fused eval pipeline) and a custom
    # first-argmax VJP for the train backward (a scatter-based reassembly
    # lowered to 4 full-res pads+copies and lost ~1.6 ms/step; the optimal
    # elementwise winner-index form tied SelectAndScatter to 0.1% in an
    # interleaved A/B — tools/experiment_maxpool_vjp.py). reduce_window
    # stays: same speed, supports higher-order/forward-mode autodiff, and
    # its SelectAndScatter VJP routes gradient to the FIRST argmax like
    # Darknet/torch (tie rule pinned vs torch in
    # tests/test_model_oracle.py::test_maxpool2x2_grad_matches_oracle_on_ties).
    # -inf (not finfo.min): JAX only recognizes the differentiable
    # reduce_window_max pattern with a -inf identity element
    neg_inf = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
               else np.asarray(jnp.iinfo(x.dtype).min, x.dtype))
    return jax.lax.reduce_window(
        x, neg_inf, jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (pad_begin, pad_h_end), (pad_begin, pad_w_end),
                 (0, 0)),
    )


def reorg(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Darknet passthrough/reorg, pytorch-yolo2 semantics (NHWC):

    out[b, i, j, (s*hi + wi)*C + c] = x[b, s*i + hi, s*j + wi, c]

    i.e. channel-major over the 2x2 subpixel position, original channels
    minor — equivalent to TF space_to_depth. Verified against the torch
    oracle transcription in tests/oracle/torch_ref.py.
    """
    b, h, w, c = x.shape
    s = stride
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // s, w // s, s * s * c)


def upsample_nearest(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Darknet [upsample]: nearest-neighbor, NHWC. Each source pixel tiles
    an s×s output block (upsample_layer.c indexing: in[i/s, j/s])."""
    b, h, w, c = x.shape
    s = stride
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c))
    return x.reshape(b, h * s, w * s, c)


def _forward_impl(params: Params, x: jnp.ndarray, spec: NetworkSpec,
                  precision: Precision, train_stats: bool, folded: bool,
                  channel_masks, fuse_input_stage: bool = False
                  ) -> jnp.ndarray:
    outputs: List[Optional[jnp.ndarray]] = []
    heads: List[jnp.ndarray] = []  # raw maps at [yolo] layers (YOLOv3)
    start = 0
    if fuse_input_stage:
        # conv1+bias+leaky+maxpool as one matmul-shaped op (Pallas on TPU)
        # — see ops/input_stage.py. Caller must have checked
        # input_stage_match(spec); requires folded BN (bias form).
        if not folded:
            raise ValueError("fuse_input_stage requires BN-folded params")
        from modelcompression_tpu.ops.input_stage import fused_conv1_pool
        p0 = params[conv_key(0)]
        y = fused_conv1_pool(x, p0["w"], p0["bias"],
                             compute_dtype=precision.compute_dtype)
        if channel_masks is not None and 0 in channel_masks:
            y = y * channel_masks[0].astype(y.dtype)[None, None, None, :]
        # layer 0's un-pooled output is never materialized (no route
        # consumes it — input_stage_match guarantees this)
        outputs.append(None)
        outputs.append(y)
        start = 2
    else:
        y = precision.cast_in(x)
    for i in range(start, len(spec.layers)):
        l = spec.layers[i]
        if isinstance(l, ConvLayer):
            p = params[conv_key(i)]
            if folded:
                y = _conv(y, p["w"], l, precision)
                y = y + p["bias"].astype(y.dtype)
                y = _activate(y, l.activation)
            else:
                y = conv_bn_act(y, p, l, precision, train_stats=train_stats)
            if channel_masks is not None and i in channel_masks:
                # post-activation channel mask: the masked twin of a
                # structurally repacked model (see compress/repack.py) —
                # zeroing here makes dropped channels contribute exactly 0
                # downstream, so slimmed forward == masked forward.
                y = y * channel_masks[i].astype(y.dtype)[None, None, None, :]
        elif isinstance(l, MaxPoolLayer):
            y = maxpool(y, l)
        elif isinstance(l, RouteLayer):
            y = jnp.concatenate([route_part(outputs[a], l)
                                 for a in l.layers], axis=-1)
        elif isinstance(l, ReorgLayer):
            y = reorg(y, l.stride)
        elif isinstance(l, ShortcutLayer):
            y = _activate(y + outputs[l.from_layer], l.activation)
        elif isinstance(l, UpsampleLayer):
            y = upsample_nearest(y, l.stride)
        elif isinstance(l, YoloLayer):
            # multi-scale head: record the raw map; y passes through
            # unchanged (Darknet's yolo layer copies input to output, and
            # later [route]s index past it, e.g. yolov3-tiny's `route -4`)
            heads.append(y.astype(jnp.float32))
        elif isinstance(l, RegionLayer):
            pass  # decode handled by evaluation.decode on the raw map
        outputs.append(y)
    if heads:
        return tuple(heads)
    return y.astype(jnp.float32)


def forward(params: Params, x: jnp.ndarray, spec: NetworkSpec,
            precision: Precision = BITMATCH,
            train_stats: bool = False,
            channel_masks=None) -> jnp.ndarray:
    """Run the network; returns the raw detection feature map
    (B, H/32, W/32, num_anchors*(5+classes)) before region decode — or,
    for multi-head [yolo] specs (YOLOv3), a TUPLE of per-scale raw maps
    in network order (decode via evaluation.decode.decode_heads).

    ``x``: NHWC float images in [0, 1] (Darknet normalization is /255 only).
    ``channel_masks``: optional {layer_idx: (C,) 0/1 vector} applied to conv
    outputs post-activation (structured-pruning masked mode).
    """
    return _forward_impl(params, x, spec, precision, train_stats,
                         folded=False, channel_masks=channel_masks)


def fold_batchnorm(params: Params, spec: NetworkSpec) -> Params:
    """Fold BN into conv weights+bias for inference:
        w' = w * gamma/sqrt(var+eps);  b' = beta - gamma*mean/sqrt(var+eps).

    Halves the epilogue work per conv and removes 4 HBM-resident vectors per
    layer — the inference-speed mode used by the batch-64 streaming config
    (BASELINE.json:11). Not bit-identical to unfolded BN (one fewer rounding
    step), so the bit-match path keeps BN unfolded.
    """
    folded: Params = {}
    for i, l in enumerate(spec.layers):
        if not isinstance(l, ConvLayer):
            continue
        p = params[conv_key(i)]
        if l.batch_normalize:
            inv = p["gamma"] / jnp.sqrt(p["var"] + BN_EPS)
            folded[conv_key(i)] = {
                "w": p["w"] * inv[None, None, None, :],
                "bias": p["beta"] - p["mean"] * inv,
            }
        else:
            folded[conv_key(i)] = dict(p)
    return folded


def forward_folded(params: Params, x: jnp.ndarray, spec: NetworkSpec,
                   precision: Precision, channel_masks=None,
                   fuse_input_stage: bool = False) -> jnp.ndarray:
    """Forward pass for BN-folded params (every conv uses bias path).

    ``fuse_input_stage``: run conv1+pool as the fused phase-matmul op
    (ops/input_stage.py) — only valid when input_stage_match(spec); FAST
    precision intended (the fusion reorders bf16 tap summation)."""
    return _forward_impl(params, x, spec, precision, train_stats=False,
                         folded=True, channel_masks=channel_masks,
                         fuse_input_stage=fuse_input_stage)


def num_params(params: Params) -> int:
    return sum(int(np.prod(v.shape))
               for p in params.values() for v in p.values())


def num_conv_flops(spec: NetworkSpec) -> int:
    """Conv MAC*2 FLOPs for one image at the spec's input size (the MFU
    numerator; pools/activations/decode are negligible next to the convs).
    Tracks per-layer spatial dims through route/reorg like the forward."""
    flops = 0
    hw: List[tuple] = []
    h, w = spec.net.height, spec.net.width
    for l in spec.layers:
        if isinstance(l, ConvLayer):
            h = (h + 2 * l.padding - l.size) // l.stride + 1
            w = (w + 2 * l.padding - l.size) // l.stride + 1
            flops += 2 * h * w * l.size * l.size * l.in_channels * l.filters
        elif isinstance(l, MaxPoolLayer):
            # darknet pool output: (h + pad_total - size)//stride + 1 — NOT
            # h//stride, which undercounts for odd spatial dims (pad_total
            # honors an explicit cfg padding= knob; default size - 1)
            h = (h + l.pad_total - l.size) // l.stride + 1
            w = (w + l.pad_total - l.size) // l.stride + 1
        elif isinstance(l, ReorgLayer):
            h, w = h // l.stride, w // l.stride
        elif isinstance(l, UpsampleLayer):
            h, w = h * l.stride, w * l.stride
        elif isinstance(l, RouteLayer):
            h, w = hw[l.layers[0]]
        hw.append((h, w))
    return flops
