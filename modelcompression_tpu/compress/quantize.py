"""Post-training int8 quantization — the second compression axis.

The reference project (SURVEY.md §1.1) compresses by pruning only; this
module adds TPU-native int8 inference on top: v5e-class MXUs run int8
matmuls at ~2x the bf16 rate and int8 activations halve HBM traffic —
the two measured walls of the fused pipeline (docs/PERF.md: the deep
conv stack is MXU-bound at ~100% bf16 MFU, the early convs HBM-bound).
It composes with structured pruning: a repacked slim model quantizes
exactly like the dense one.

Scheme (standard symmetric PTQ, laid out for XLA fusion):

* **Weights**: per-output-channel symmetric int8 (`s_w[c] =
  max|w[...,c]| / 127`), quantized from the BN-folded weights so the
  whole conv epilogue is one fused rescale.
* **Activations**: per-tensor symmetric int8 with static scales from a
  calibration pass. Activations FLOW as int8 between layers (that is
  where the HBM halving comes from); each conv consumes its producer's
  int8 tensor directly:

      y32 = conv(x_q, w_q)                  # int8 x int8 -> int32 (MXU)
      y   = y32 * (s_in * s_w[c]) + bias    # f32, fused epilogue
      a   = leaky(y)
      out = clip(round(a / s_out), -127, 127).astype(int8)

  Head-producing convs skip requantization and return the raw f32 map
  (YOLOv2: the last conv; YOLOv3: one conv per [yolo] scale).
* **Scale-preserving ops**: maxpool, reorg and upsample pass int8
  through untouched (max, layout and nearest-replication commute with a
  positive scale). ``route`` concats require all inputs to share one
  scale — calibration merges the scale groups of every route's inputs
  (max over the group), so concat is exact rather than silently mixing
  scales. ``shortcut`` residual adds (YOLOv3) are float boundaries: the
  sum lives on neither operand's grid, so both inputs dequantize, the
  add runs in the compute dtype, and the consumer requantizes on the
  shortcut's own calibrated scale.
* **Calibration** runs the f32 folded forward over a few batches and
  records per-layer output absmax (optionally a quantile, to shed
  outliers). ~100 images is plenty for per-tensor absmax.

Quantized inference is a distinct forward (``forward_quantized``) rather
than a Precision policy: the dtype changes per edge (int8 tensors, int32
accum, f32 epilogue), which doesn't fit the uniform-dtype Precision
contract (core/precision.py).

**Hybrid mode** (``int8_layers=``): the on-chip per-layer A/B
(tools/experiment_int8.py, docs/PERF.md) shows int8 wins ~1.7x where the
MXU is the wall but LOSES on the HBM-bound early convs, where the
requant epilogue costs more than the MAC savings. ``quantize_network``
therefore accepts a subset of conv indices to quantize; the rest run in
the FAST bf16 path from the same pytree. The forward tracks each
tensor's scale at trace time and inserts the (de)quantization exactly at
the int8/float region boundaries — any subset is numerically valid,
including int8 islands and mixed-dtype route concats.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.core.precision import FAST, Precision
from modelcompression_tpu.models.cfg import (
    ConvLayer, MaxPoolLayer, NetworkSpec, RegionLayer, ReorgLayer, RouteLayer,
    ShortcutLayer, UpsampleLayer, YoloLayer, dump_cfg, parse_cfg,
)
from modelcompression_tpu.models.darknet import (
    Params, _activate, conv_key, maxpool, reorg, route_part as _route_part,
    upsample_nearest,
)

QParams = Dict[str, Dict[str, jnp.ndarray]]


def _input_layer_of(spec: NetworkSpec, i: int) -> int:
    """Index of the layer whose output feeds layer ``i`` sequentially
    (-1 = the network input). Route layers name their inputs explicitly
    and are handled separately."""
    return i - 1


def _scale_groups(spec: NetworkSpec) -> List[int]:
    """Union-find over layer outputs that must share one activation scale.

    Every layer starts in its own group; scale-preserving ops (maxpool,
    reorg, single-input route) join their input's group, and multi-input
    routes merge ALL their inputs' groups (concat must be single-scale
    to stay exact). Returns group id per layer index, PLUS one trailing
    entry for the NETWORK INPUT's group — a scale-preserving layer at
    index 0 must join the input's group, not (via Python's negative
    indexing) the last layer's."""
    n = len(spec.layers)
    parent = list(range(n + 1))  # node n = the network input

    def node(j: int) -> int:
        return n if j < 0 else j

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for i, l in enumerate(spec.layers):
        if isinstance(l, (MaxPoolLayer, ReorgLayer, UpsampleLayer)):
            # max / layout / nearest-replication commute with a positive
            # per-tensor scale: int8 passes through on the producer's grid
            union(i, node(_input_layer_of(spec, i)))
        elif isinstance(l, RouteLayer):
            for a in l.layers:
                union(i, a)
        elif isinstance(l, (RegionLayer, YoloLayer)):
            # heads copy their input through (Darknet yolo_layer forwards
            # its input so later routes can index past it)
            union(i, node(_input_layer_of(spec, i)))
        # ShortcutLayer: the residual ADD produces genuinely new values —
        # it is a float boundary with its OWN calibrated output scale
        # (each layer starts in its own group; no union)
    return [find(i) for i in range(n + 1)]


def collect_act_absmax(folded_params: Params, spec: NetworkSpec,
                       batches: Sequence[np.ndarray],
                       quantile: Optional[float] = None
                       ) -> Tuple[np.ndarray, float]:
    """Per-layer output absmax over calibration batches (f32 forward).

    ``batches``: float images in [0, 1], NHWC (the post-letterbox canvas —
    calibrate with the same preprocessing inference uses).
    ``quantile``: optional in (0, 1) — use that quantile of |activation|
    instead of the max to shed outliers (absmax is exact-range but one
    hot pixel can cost the whole tensor resolution).

    Returns (absmax per layer index, input absmax)."""
    n_layers = len(spec.layers)

    @jax.jit
    def run(params, x):
        stats = []
        outputs: List[Optional[jnp.ndarray]] = []
        y = x.astype(jnp.float32)

        def stat(t):
            a = jnp.abs(t.astype(jnp.float32)).ravel()
            if quantile is not None:
                return jnp.quantile(a, quantile)
            return jnp.max(a)

        for i in range(n_layers):
            l = spec.layers[i]
            if isinstance(l, ConvLayer):
                p = params[conv_key(i)]
                y = jax.lax.conv_general_dilated(
                    y, p["w"].astype(jnp.float32),
                    window_strides=(l.stride, l.stride),
                    padding=((l.padding, l.padding),
                             (l.padding, l.padding)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = y + p["bias"].astype(jnp.float32)
                y = _activate(y, l.activation)
            elif isinstance(l, MaxPoolLayer):
                y = maxpool(y, l)
            elif isinstance(l, RouteLayer):
                y = jnp.concatenate(
                    [_route_part(outputs[a], l) for a in l.layers],
                    axis=-1)
            elif isinstance(l, ReorgLayer):
                y = reorg(y, l.stride)
            elif isinstance(l, ShortcutLayer):
                y = _activate(y + outputs[l.from_layer], l.activation)
            elif isinstance(l, UpsampleLayer):
                y = upsample_nearest(y, l.stride)
            # Region/Yolo heads pass y through unchanged
            outputs.append(y)
            stats.append(stat(y))
        return jnp.stack(stats), stat(x)

    absmax = np.zeros(n_layers, np.float32)
    in_max = 0.0
    for b in batches:
        s, im = jax.device_get(run(folded_params, jnp.asarray(b)))
        absmax = np.maximum(absmax, s)
        in_max = max(in_max, float(im))
    return absmax, in_max


def int8_layers_auto(spec: NetworkSpec,
                     min_channels: int = 128) -> List[int]:
    """Conv indices worth quantizing per the on-chip crossover: int8 wins
    where the MXU is the wall, which needs both operand channel dims wide
    enough to fill lanes (measured: 32->64 @208² loses, 128->256 @52²
    onward wins ~1.7x — docs/PERF.md). Selects convs with
    min(Cin, Cout) >= ``min_channels``."""
    sel = []
    for i, l in enumerate(spec.layers):
        if isinstance(l, ConvLayer):
            # in_channels is filled by cfg._resolve_channels at parse
            # time — the one channel-propagation walk in the codebase
            if min(l.in_channels, l.filters) >= min_channels:
                sel.append(i)
    return sel


def resolve_int8_layers(spec: NetworkSpec,
                        selector: str) -> Optional[List[int]]:
    """Parse a CLI layer selector into conv indices (None = all):
    ``all`` | ``auto`` | ``auto:<min_channels>`` | ``3,7,12`` (explicit
    layer indices)."""
    s = selector.strip().lower()
    if s == "all":
        return None
    if s == "auto":
        return int8_layers_auto(spec)
    if s.startswith("auto:"):
        return int8_layers_auto(spec, min_channels=int(s.split(":", 1)[1]))
    return [int(t) for t in s.split(",") if t.strip()]


def _layer_out_scales(spec: NetworkSpec, act_absmax: Sequence[float],
                      input_absmax: float) -> Tuple[List[float], float]:
    """Per-LAYER-index activation quantization step (scale-group-merged,
    see ``_scale_groups``) plus the input scale — the single source of
    the deployed activation grids, shared by PTQ (``quantize_network``)
    and QAT (``qat.qat_spec_from_absmax``)."""
    groups = _scale_groups(spec)  # trailing entry = network-input group
    group_max: Dict[int, float] = {groups[-1]: float(input_absmax)}
    for i, g in enumerate(groups[:-1]):
        group_max[g] = max(group_max.get(g, 0.0), float(act_absmax[i]))
    # guard degenerate all-zero activations (untrained/pruned-to-death)
    out_scale = [max(group_max[g], 1e-8) / 127.0 for g in groups[:-1]]
    return out_scale, max(group_max[groups[-1]], 1e-8) / 127.0


def _resolve_int8_set(spec: NetworkSpec,
                      int8_layers: Optional[Iterable[int]]
                      ) -> Tuple[List[int], set]:
    """(all conv ids, validated int8 subset — all of them when None)."""
    conv_ids = [i for i, l in enumerate(spec.layers)
                if isinstance(l, ConvLayer)]
    int8_set = set(conv_ids) if int8_layers is None else set(int8_layers)
    if not int8_set <= set(conv_ids):
        raise ValueError(
            f"int8_layers {sorted(int8_set - set(conv_ids))} are not conv "
            f"layers of this spec")
    return conv_ids, int8_set


def quantize_network(folded_params: Params, spec: NetworkSpec,
                     act_absmax: np.ndarray,
                     input_absmax: float = 1.0,
                     int8_layers: Optional[Iterable[int]] = None) -> QParams:
    """Build the (possibly hybrid) quantized pytree from BN-folded f32
    params.

    ``act_absmax``: per-layer output absmax from ``collect_act_absmax``.
    ``int8_layers``: conv indices to quantize (None = every conv). Convs
    not selected keep f32 weights and run the bf16 FAST path in
    ``forward_quantized`` — see ``int8_layers_auto`` for the measured
    selection rule.

    Scales are stored as arrays in the pytree (recalibration never
    recompiles the forward). Layout per int8 conv:
      w_q (HWIO int8), s_w (Cout f32), bias (Cout f32),
      in_scale (f32 scalar), out_scale (f32 scalar; final conv: absent);
    per float conv: w (HWIO f32), bias (Cout f32).
    """
    from modelcompression_tpu.compress.graph import head_producer_convs
    out_scale, input_scale = _layer_out_scales(spec, act_absmax,
                                               input_absmax)
    conv_ids, int8_set = _resolve_int8_set(spec, int8_layers)
    # head-producing convs skip output requantization and emit the raw
    # f32 detection map (YOLOv2: the single last conv; YOLOv3: one conv
    # per [yolo] scale — compress/graph.py)
    head_convs = head_producer_convs(spec)
    qparams: QParams = {"__net__": {
        "input_scale": jnp.float32(input_scale)}}
    for i in conv_ids:
        p = folded_params[conv_key(i)]
        w = np.asarray(p["w"], np.float32)
        bias = jnp.asarray(np.asarray(p["bias"], np.float32))
        if i not in int8_set:
            qparams[conv_key(i)] = {"w": jnp.asarray(w), "bias": bias}
            continue
        s_w = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0),
                         1e-12) / 127.0
        w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        j = _input_layer_of(spec, i)
        in_scale = (float(qparams["__net__"]["input_scale"]) if j < 0
                    else out_scale[j])
        entry = {
            "w_q": jnp.asarray(w_q),
            "s_w": jnp.asarray(s_w),
            "bias": bias,
            "in_scale": jnp.float32(in_scale),
        }
        if i not in head_convs:
            entry["out_scale"] = jnp.float32(out_scale[i])
        qparams[conv_key(i)] = entry
    return qparams


def forward_quantized(qparams: QParams, x: jnp.ndarray,
                      spec: NetworkSpec,
                      precision: Precision = FAST) -> jnp.ndarray:
    """Quantized (possibly hybrid) forward; ``x`` float images in [0, 1]
    (letterboxed canvas), or an INT8 canvas already on the network-input
    grid (``data.preprocess.quantize_canvas`` with the calibrated
    ``input_scale`` — the integer-domain input stage: the producer fused
    the quantize into the letterbox, so the first int8 conv consumes the
    canvas directly and no float canvas ever touches HBM).

    Returns the raw f32 detection map — or, for multi-head [yolo] specs
    (YOLOv3), a TUPLE of per-scale raw f32 maps — same contract as
    ``darknet.forward_folded``. Within an int8 region activations flow
    as int8 between layers; the conv epilogue (rescale + bias + leaky +
    requant) is elementwise and fuses into the conv, so each layer is
    one MXU int8 op plus a fused VPU tail. Convs whose pytree entry
    holds f32 weights (hybrid mode, ``quantize_network(int8_layers=)``)
    run in ``precision``'s compute dtype (bf16 under FAST); the forward
    tracks each tensor's scale at trace time and (de)quantizes exactly
    at region boundaries, so any int8 subset — islands, mixed routes —
    is numerically valid.
    """
    cdt = precision.compute_dtype
    # (tensor, scale): scale is the producer's quantization step for an
    # int8 tensor, None for a float tensor — resolved at trace time
    outputs: List[jnp.ndarray] = []
    scales: List[Optional[jnp.ndarray]] = []
    heads: List[jnp.ndarray] = []  # raw f32 maps at [yolo] layers
    y, y_scale = x, None
    if x.dtype == jnp.int8:
        # int8-input contract: the producer quantized with THIS pytree's
        # input_scale (the scale travels with the params, so a
        # recalibration changes both sides together)
        y_scale = qparams["__net__"]["input_scale"]

    def dequant(t, s):
        return t.astype(cdt) * s.astype(cdt)

    for i, l in enumerate(spec.layers):
        if isinstance(l, ConvLayer):
            p = qparams[conv_key(i)]
            if "w_q" in p:  # int8 conv
                if y_scale is None:
                    q_in = jnp.clip(
                        jnp.round(y.astype(jnp.float32) / p["in_scale"]),
                        -127, 127).astype(jnp.int8)
                else:
                    q_in = y  # producer already on this grid (shared group)
                y32 = jax.lax.conv_general_dilated(
                    q_in, p["w_q"],
                    window_strides=(l.stride, l.stride),
                    padding=((l.padding, l.padding),
                             (l.padding, l.padding)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                yf = (y32.astype(jnp.float32) * (p["in_scale"] * p["s_w"])
                      + p["bias"])
                yf = _activate(yf, l.activation)
                if "out_scale" not in p:  # head producer: raw f32 map out
                    y, y_scale = yf, None
                else:
                    y = jnp.clip(jnp.round(yf / p["out_scale"]),
                                 -127, 127).astype(jnp.int8)
                    y_scale = p["out_scale"]
            else:  # float conv, FAST-path semantics
                xin = (dequant(y, y_scale) if y_scale is not None
                       else y.astype(cdt))
                yf = jax.lax.conv_general_dilated(
                    xin, p["w"].astype(cdt),
                    window_strides=(l.stride, l.stride),
                    padding=((l.padding, l.padding),
                             (l.padding, l.padding)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=precision.conv_precision,
                    preferred_element_type=precision.accum_dtype)
                y = _activate(yf + p["bias"].astype(cdt), l.activation)
                y_scale = None
        elif isinstance(l, MaxPoolLayer):
            y = maxpool(y, l)  # int8-safe: pads with typed iinfo.min
        elif isinstance(l, RouteLayer):
            parts = [_route_part(outputs[a], l) for a in l.layers]
            part_scales = [scales[a] for a in l.layers]
            if all(s is not None for s in part_scales):
                # exact: calibration merged the route's inputs into one
                # scale group, so the int8 concat is scale-consistent
                y = jnp.concatenate(parts, axis=-1)
                y_scale = part_scales[0]
            else:
                parts = [dequant(t, s) if s is not None else t.astype(cdt)
                         for t, s in zip(parts, part_scales)]
                y = jnp.concatenate(parts, axis=-1)
                y_scale = None
        elif isinstance(l, ReorgLayer):
            y = reorg(y, l.stride)
        elif isinstance(l, UpsampleLayer):
            y = upsample_nearest(y, l.stride)  # scale-preserving (int8 ok)
        elif isinstance(l, ShortcutLayer):
            # residual add is a float boundary (see _scale_groups): the
            # sum lives on no operand's grid, so dequant both, add in the
            # compute dtype, and let the CONSUMER requantize on the
            # shortcut layer's own calibrated in_scale
            a = dequant(y, y_scale) if y_scale is not None else y.astype(cdt)
            o, os_ = outputs[l.from_layer], scales[l.from_layer]
            b = dequant(o, os_) if os_ is not None else o.astype(cdt)
            y = _activate(a + b, l.activation)
            y_scale = None
        elif isinstance(l, YoloLayer):
            # record this scale's raw f32 map; y passes through unchanged
            # (later routes may index past the head, e.g. v3-tiny)
            heads.append((dequant(y, y_scale) if y_scale is not None
                          else y).astype(jnp.float32))
        elif isinstance(l, RegionLayer):
            pass
        outputs.append(y)
        scales.append(y_scale)
    if heads:
        return tuple(heads)
    if y_scale is not None:  # head ended inside an int8 region
        y = dequant(y, y_scale)
    return y.astype(jnp.float32)


def save_qmodel(path: str, qparams: QParams, spec: NetworkSpec,
                pack: Optional[str] = None) -> None:
    """Save the deployed int8 model as ONE standalone artifact (.npz):
    the quantized pytree (int8 weights, f32 scales/biases) plus the
    architecture cfg text, so serving needs neither the original
    ``.weights`` nor calibration data. int8 weight bytes compress well;
    a full YOLOv2 artifact is ~4x smaller than its f32 ``.weights``.

    ``pack='huffman'`` (or ``'fixed'``) entropy-codes each int8 weight
    tensor via `compress/packing.py` (symbols = w_q + 128, K = 256) —
    on a PRUNED int8 model the dominant zero symbol takes the artifact
    well under 8 bits/weight; unpacked by ``load_qmodel``
    transparently. f32 tensors (scales/biases, and any bf16-kept convs
    of a hybrid subset) stay raw and ride the npz container's zlib.

    The reference interchanges f32 ``.weights`` only (SURVEY.md §A.2);
    this is the deployment-artifact counterpart for the quantization
    axis, mirroring how checkpoints carry ``arch.cfg``
    (utils/checkpoint.py)."""
    from modelcompression_tpu.compress.packing import pack_codes
    flat = {"__cfg__": np.array(dump_cfg(spec))}
    for key, entry in qparams.items():
        for field, v in entry.items():
            v = np.asarray(v)
            if pack is not None and field == "w_q":
                sym = (v.astype(np.int16) + 128).astype(np.uint16)
                for pf, pv in pack_codes(sym, 256, pack).items():
                    flat[f"{key}/wq_{pf}"] = pv
            else:
                flat[f"{key}/{field}"] = v
    with open(path, "wb") as f:  # exact path (np would append .npz)
        np.savez_compressed(f, **flat)


def _arch_mismatch(a: NetworkSpec, b: NetworkSpec) -> Optional[str]:
    """First architectural difference between two specs (None if they
    describe the same network shape). Train hyperparameters (lr, batch,
    augment knobs) are deliberately NOT compared — a serving cfg may
    legitimately differ there."""
    if (a.net.height, a.net.width, a.net.channels) != \
            (b.net.height, b.net.width, b.net.channels):
        return (f"net {a.net.height}x{a.net.width}x{a.net.channels} != "
                f"{b.net.height}x{b.net.width}x{b.net.channels}")
    if len(a.layers) != len(b.layers):
        return f"{len(a.layers)} layers != {len(b.layers)}"
    for i, (la, lb) in enumerate(zip(a.layers, b.layers)):
        if isinstance(la, RegionLayer) and isinstance(lb, RegionLayer):
            # only the decode-relevant fields; loss scales / jitter are
            # train knobs a serving cfg may legitimately change
            def decode_key(l):
                return (l.anchors, l.classes, l.num, l.coords, l.softmax)
            if decode_key(la) != decode_key(lb):
                return f"layer {i}: {la!r} != {lb!r}"
        elif la != lb:
            return f"layer {i}: {la!r} != {lb!r}"
    return None


def load_qmodel(path: str, spec: Optional[NetworkSpec] = None
                ) -> Tuple[QParams, NetworkSpec]:
    """Load a ``save_qmodel`` artifact. Returns (qparams, spec).

    When ``spec`` is given, the artifact's embedded architecture must
    match it (layer-by-layer; train hyperparameters are not compared) —
    the same guard checkpoint restore applies. The loaded pytree drives
    ``forward_quantized`` bit-identically to the pytree that was saved
    (int8/f32 arrays round-trip exactly through npz)."""
    with np.load(path, allow_pickle=False) as z:
        loaded_spec = parse_cfg(str(z["__cfg__"][()]))
        if spec is not None:
            diff = _arch_mismatch(spec, loaded_spec)
            if diff is not None:
                raise ValueError(
                    f"qmodel {path} was saved for a different "
                    f"architecture: {diff}")
        qparams: QParams = {}
        packed: dict = {}
        for k in z.files:
            if k == "__cfg__":
                continue
            key, field = k.rsplit("/", 1)
            if field.startswith("wq_"):
                packed.setdefault(key, {})[field[3:]] = z[k]
            else:
                qparams.setdefault(key, {})[field] = jnp.asarray(z[k])
    if packed:
        from modelcompression_tpu.compress.packing import unpack_codes
        for key, fields in packed.items():
            w_q = (unpack_codes(fields).astype(np.int16) - 128
                   ).astype(np.int8)
            qparams.setdefault(key, {})["w_q"] = jnp.asarray(w_q)
    return qparams, (spec if spec is not None else loaded_spec)


def quantize_from_batches(folded_params: Params, spec: NetworkSpec,
                          batches: Sequence[np.ndarray],
                          quantile: Optional[float] = None,
                          int8_layers: Optional[Iterable[int]] = None,
                          ) -> QParams:
    """Calibrate + quantize in one call (the common entry point)."""
    absmax, in_max = collect_act_absmax(folded_params, spec, batches,
                                        quantile=quantile)
    return quantize_network(folded_params, spec, absmax,
                            input_absmax=in_max, int8_layers=int8_layers)
