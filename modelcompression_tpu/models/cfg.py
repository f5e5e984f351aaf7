"""Darknet ``.cfg`` importer → typed layer spec.

The reference's config system IS the Darknet cfg format (SURVEY.md §5.6):
INI-style sections (``[net]``, ``[convolutional]``, ``[maxpool]``, ``[route]``,
``[reorg]``, ``[region]``) that define both the architecture and training
hyper-parameters. We keep `.cfg` compatibility as an importer/exporter (needed
to ingest reference architectures and to emit rewritten cfgs after structured
repack, SURVEY.md §3.3) while the in-memory representation is a typed
dataclass tree.

Layer indexing follows Darknet: every section after ``[net]`` gets an index,
and ``[route]`` ``layers=`` entries are relative (negative) or absolute layer
indices into that numbering.
"""

from __future__ import annotations

import dataclasses
import io
import math
import warnings
from typing import List, Tuple, Union


class UnknownCfgKeyWarning(UserWarning):
    """A cfg section carried keys the parser does not consume.

    The cfg IS the config system (SURVEY.md §5.6): a silently-dropped key
    means a network trains or evaluates with different semantics than its
    cfg states (e.g. an upstream ``iou_loss=ciou`` falling back to the
    MSE-form loss). ``parse_cfg(strict=True)`` upgrades this to an error.
    """


@dataclasses.dataclass
class NetConfig:
    width: int = 416
    height: int = 416
    channels: int = 3
    batch: int = 64
    subdivisions: int = 8
    momentum: float = 0.9
    decay: float = 0.0005
    learning_rate: float = 1e-3
    max_batches: int = 80200
    policy: str = "steps"
    steps: Tuple[int, ...] = ()
    scales: Tuple[float, ...] = ()
    burn_in: int = 0
    # lr-policy knobs for poly/exp/sig/step policies (Darknet [net])
    power: float = 4.0
    gamma: float = 1.0
    step: int = 1
    # augmentation knobs (Darknet [net] section)
    angle: float = 0.0
    saturation: float = 1.5
    exposure: float = 1.5
    hue: float = 0.1
    # [net] mosaic=1 (AlexeyAB cfg convention, yolov4 era): train with
    # 4-image mosaic composition by default. The train/finetune CLIs use
    # this as the default for their --mosaic flag (data/preprocess.py
    # implements the augmentation on device).
    mosaic: bool = False


@dataclasses.dataclass
class ConvLayer:
    filters: int
    size: int = 3
    stride: int = 1
    pad: int = 1
    batch_normalize: bool = False
    activation: str = "leaky"
    # filled in at build time
    in_channels: int = -1

    @property
    def padding(self) -> int:
        return self.size // 2 if self.pad else 0


@dataclasses.dataclass
class MaxPoolLayer:
    size: int = 2
    stride: int = 2
    padding: int = -1  # -1 -> Darknet default (size - 1)

    @property
    def pad_total(self) -> int:
        return self.size - 1 if self.padding < 0 else self.padding


@dataclasses.dataclass
class RouteLayer:
    """Darknet route: channel-concat of earlier layers' outputs.

    ``groups``/``group_id`` (Darknet CSP convention, yolov4-tiny): each
    source's channels are split into ``groups`` equal slices and only
    slice ``group_id`` is taken — the CSPNet partial-dense split. With
    groups=1 (default) this is the classic full concat."""
    layers: Tuple[int, ...]  # absolute layer indices (resolved at parse time)
    groups: int = 1
    group_id: int = 0


@dataclasses.dataclass
class ReorgLayer:
    stride: int = 2


@dataclasses.dataclass
class ShortcutLayer:
    """Darknet residual add (YOLOv3): out = prev + outputs[from_layer].

    ``from_layer`` is stored as an ABSOLUTE layer index (resolved at parse
    time like RouteLayer). Darknet's shortcut supports mismatched channel
    counts by zero-extending; YOLOv3's cfgs only ever add equal shapes, so
    we require equality (checked at channel-resolution time)."""
    from_layer: int
    activation: str = "linear"


@dataclasses.dataclass
class UpsampleLayer:
    """Nearest-neighbor spatial upsample (YOLOv3 FPN top-down path)."""
    stride: int = 2


@dataclasses.dataclass
class YoloLayer:
    """Darknet [yolo] detection head (YOLOv3): multi-scale, multi-label.

    Unlike [region]: anchors are in NETWORK-INPUT PIXELS (not cells),
    ``mask`` selects this scale's anchor subset from the shared list, and
    class probabilities are independent sigmoids (multi-label), not a
    softmax. ``num`` is the TOTAL anchor count across scales; this head
    predicts len(mask) boxes per cell."""
    mask: Tuple[int, ...] = ()
    anchors: Tuple[float, ...] = ()
    classes: int = 80
    num: int = 9
    jitter: float = 0.3
    ignore_thresh: float = 0.7
    truth_thresh: float = 1.0
    random: bool = False
    # YOLOv4 grid-sensitivity fix: bx = (s*sigmoid(tx) - (s-1)/2 + cx)/W
    # — stretches the per-cell offset past [0,1] so boxes can sit exactly
    # on cell boundaries without saturating the logistic. 1.0 = classic
    # YOLOv3 decode.
    scale_x_y: float = 1.0
    # YOLOv4 box-regression loss family (AlexeyAB darknet [yolo] keys;
    # train/yolo_loss.py implements the semantics):
    #   iou_loss: "mse" (classic v3 BCE/half-SE coord form) | "giou" |
    #     "diou" | "ciou" — the IoU-based regression losses (Rezatofighi
    #     et al. 2019; Zheng et al. 2020 DIoU/CIoU).
    #   iou_normalizer: scale on the IoU-loss coord deltas (darknet
    #     default 0.75; yolov4 cfgs ship 0.07).
    #   cls_normalizer: scale on the OBJECTNESS deltas — in the
    #     yolov4-release darknet, cls_normalizer multiplies the obj/noobj
    #     delta, NOT the per-class deltas (the later obj_normalizer split
    #     postdates the v4 cfgs); documented quirk, train/yolo_loss.py.
    #   max_delta: symmetric clip on the 4 coord deltas AFTER the
    #     normalizer (darknet delta_yolo_box order). inf = no clip.
    iou_loss: str = "mse"
    iou_normalizer: float = 0.75
    cls_normalizer: float = 1.0
    max_delta: float = math.inf
    # darknet multi-anchor assignment ([yolo] iou_thresh, yolov4.cfg
    # ships 0.213): besides its best global anchor, a GT also trains
    # EVERY anchor slot whose shape-only IoU clears this threshold (at
    # the GT's cell, in the head owning that anchor). 1.0 = best-only
    # (the classic v3 rule). train/yolo_loss.py implements it.
    iou_thresh: float = 1.0
    # serving-side NMS defaults from the cfg (darknet nms_kind/beta_nms):
    # "greedynms" = classic greedy IoU suppression (darknet's DEFAULT_NMS
    # and GREEDY_NMS behave identically at inference); "diounms" =
    # DIoU-NMS with penalty (rho^2/c^2)^beta_nms (evaluation/nms.py).
    # cli/common.resolve_serving_eval_config consumes these as defaults.
    nms_kind: str = "greedynms"
    beta_nms: float = 0.6
    # random-resize range multiplier for multi-scale training (AlexeyAB
    # [yolo] resize=1.5): with random=1 the loader resizes the network
    # between net/resize and net*resize (rounded to stride multiples);
    # 1.0 = keep the classic (320, 608) default range. cli/train.py
    # consumes it.
    resize: float = 1.0

    @property
    def anchor_pairs(self) -> Tuple[Tuple[float, float], ...]:
        """This scale's (w, h) anchors in network-input pixels."""
        a = self.anchors
        return tuple((a[2 * m], a[2 * m + 1]) for m in self.mask)

    @property
    def n(self) -> int:
        return len(self.mask)


@dataclasses.dataclass
class RegionLayer:
    anchors: Tuple[float, ...] = ()
    classes: int = 20
    num: int = 5
    coords: int = 4
    softmax: bool = True
    rescore: bool = True
    bias_match: bool = True
    jitter: float = 0.3
    object_scale: float = 5.0
    noobject_scale: float = 1.0
    class_scale: float = 1.0
    coord_scale: float = 1.0
    thresh: float = 0.6
    absolute: bool = True
    random: bool = False

    @property
    def anchor_pairs(self) -> Tuple[Tuple[float, float], ...]:
        a = self.anchors
        return tuple((a[2 * i], a[2 * i + 1]) for i in range(len(a) // 2))


Layer = Union[ConvLayer, MaxPoolLayer, RouteLayer, ReorgLayer, RegionLayer,
              ShortcutLayer, UpsampleLayer, YoloLayer]


@dataclasses.dataclass
class NetworkSpec:
    net: NetConfig
    layers: List[Layer]

    @property
    def region(self) -> RegionLayer:
        for l in reversed(self.layers):
            if isinstance(l, RegionLayer):
                return l
        raise ValueError("spec has no [region] layer")

    def head_indices(self) -> List[int]:
        """Layer indices of detection heads: the [region] layer (YOLOv2,
        always exactly one) or every [yolo] layer (YOLOv3, one per scale,
        in network order — the order forward() returns raw maps)."""
        idx = [i for i, l in enumerate(self.layers)
               if isinstance(l, (RegionLayer, YoloLayer))]
        if not idx:
            raise ValueError("spec has no [region] or [yolo] layer")
        return idx

    @property
    def is_multi_head(self) -> bool:
        """True for [yolo]-family specs: forward returns one raw map per
        head and decode is the YOLOv3 sigmoid-class form."""
        return any(isinstance(l, YoloLayer) for l in self.layers)

    @property
    def classes(self) -> int:
        l = self.layers[self.head_indices()[0]]
        return l.classes

    def conv_indices(self) -> List[int]:
        return [i for i, l in enumerate(self.layers)
                if isinstance(l, ConvLayer)]


class _Section(dict):
    """Section key/value dict that RECORDS which keys the parser consumed
    (via get / [] / ``in``) — the unknown-key audit compares the recorded
    set against the keys present, so the audit can never drift from the
    parser code itself (a new key is 'known' exactly when some parse
    branch reads it)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.accessed = set()

    def get(self, k, default=None):
        self.accessed.add(k)
        return super().get(k, default)

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        self.accessed.add(k)
        return super().__contains__(k)


def _parse_sections(text: str) -> List[Tuple[str, "_Section"]]:
    sections: List[Tuple[str, _Section]] = []
    current = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", ";")):
            continue
        if line.startswith("["):
            current = (line.strip("[]").lower(), _Section())
            sections.append(current)
        elif current is not None and "=" in line:
            k, v = line.split("=", 1)
            dict.__setitem__(current[1], k.strip(), v.strip())
    return sections


def _ints(s: str) -> Tuple[int, ...]:
    return tuple(int(x) for x in s.replace(" ", "").split(",") if x)


def _floats(s: str) -> Tuple[float, ...]:
    return tuple(float(x) for x in s.replace(" ", "").split(",") if x)


IOU_LOSSES = ("mse", "giou", "diou", "ciou")
NMS_KINDS = ("greedynms", "diounms")


def parse_cfg(text: str, strict: bool = False) -> NetworkSpec:
    """Parse Darknet cfg text into a NetworkSpec.

    Every key the parser does not consume is REPORTED: warned as
    ``UnknownCfgKeyWarning`` by default, raised as ValueError under
    ``strict=True`` (the CLIs expose ``--strict-cfg``). No key is ever
    silently dropped — a cfg key the framework does not implement must
    be visible, because the cfg is the config system (SURVEY.md §5.6)
    and a dropped key changes training/eval semantics behind the
    operator's back (e.g. ``iou_loss=ciou`` falling back to MSE).
    """
    sections = _parse_sections(text)
    if not sections or sections[0][0] not in ("net", "network"):
        raise ValueError("cfg must start with a [net] section")

    o = sections[0][1]
    net = NetConfig(
        width=int(o.get("width", 416)),
        height=int(o.get("height", 416)),
        channels=int(o.get("channels", 3)),
        batch=int(o.get("batch", 64)),
        subdivisions=int(o.get("subdivisions", 1)),
        momentum=float(o.get("momentum", 0.9)),
        decay=float(o.get("decay", 0.0005)),
        learning_rate=float(o.get("learning_rate", 1e-3)),
        max_batches=int(o.get("max_batches", 80200)),
        policy=o.get("policy", "steps"),
        steps=_ints(o["steps"]) if "steps" in o else (),
        scales=_floats(o["scales"]) if "scales" in o else (),
        burn_in=int(o.get("burn_in", 0)),
        power=float(o.get("power", 4)),
        gamma=float(o.get("gamma", 1)),
        step=int(o.get("step", 1)),
        angle=float(o.get("angle", 0)),
        saturation=float(o.get("saturation", 1.5)),
        exposure=float(o.get("exposure", 1.5)),
        hue=float(o.get("hue", 0.1)),
        mosaic=bool(int(o.get("mosaic", 0))),
    )

    layers: List[Layer] = []
    for name, o in sections[1:]:
        idx = len(layers)
        if name == "convolutional":
            layers.append(ConvLayer(
                filters=int(o["filters"]),
                size=int(o.get("size", 1)),
                stride=int(o.get("stride", 1)),
                pad=int(o.get("pad", 0)),
                batch_normalize=bool(int(o.get("batch_normalize", 0))),
                activation=o.get("activation", "logistic"),
            ))
        elif name == "maxpool":
            layers.append(MaxPoolLayer(
                size=int(o.get("size", 2)),
                stride=int(o.get("stride", 2)),
                padding=int(o.get("padding", -1)),
            ))
        elif name == "route":
            rel = _ints(o["layers"])
            absolute = tuple(r if r >= 0 else idx + r for r in rel)
            for a in absolute:
                if not (0 <= a < idx):
                    raise ValueError(f"route at layer {idx} references {a}")
            groups = int(o.get("groups", 1))
            group_id = int(o.get("group_id", 0))
            if groups < 1 or not (0 <= group_id < groups):
                raise ValueError(
                    f"route at layer {idx}: need groups >= 1 and "
                    f"0 <= group_id < groups, got groups={groups} "
                    f"group_id={group_id}")
            layers.append(RouteLayer(layers=absolute, groups=groups,
                                     group_id=group_id))
        elif name == "reorg":
            layers.append(ReorgLayer(stride=int(o.get("stride", 2))))
        elif name == "shortcut":
            rel = int(o["from"])
            absolute = rel if rel >= 0 else idx + rel
            if not (0 <= absolute < idx):
                raise ValueError(f"shortcut at layer {idx} references "
                                 f"{absolute}")
            layers.append(ShortcutLayer(
                from_layer=absolute,
                activation=o.get("activation", "linear"),
            ))
        elif name == "upsample":
            layers.append(UpsampleLayer(stride=int(o.get("stride", 2))))
        elif name == "yolo":
            iou_loss = o.get("iou_loss", "mse").strip().lower()
            if iou_loss not in IOU_LOSSES:
                raise ValueError(
                    f"[yolo] at layer {idx}: iou_loss={iou_loss!r} is not "
                    f"one of {IOU_LOSSES}")
            nms_kind = o.get("nms_kind", "greedynms").strip().lower()
            # darknet's DEFAULT_NMS and GREEDY_NMS are the same greedy
            # IoU suppression at inference; normalize the alias
            if nms_kind == "default":
                nms_kind = "greedynms"
            if nms_kind not in NMS_KINDS:
                raise ValueError(
                    f"[yolo] at layer {idx}: nms_kind={nms_kind!r} is not "
                    f"one of {NMS_KINDS} (or 'default')")
            layers.append(YoloLayer(
                mask=_ints(o.get("mask", "")),
                anchors=_floats(o.get("anchors", "")),
                classes=int(o.get("classes", 80)),
                num=int(o.get("num", 9)),
                jitter=float(o.get("jitter", 0.3)),
                ignore_thresh=float(o.get("ignore_thresh", 0.7)),
                truth_thresh=float(o.get("truth_thresh", 1.0)),
                random=bool(int(float(o.get("random", 0)))),
                scale_x_y=float(o.get("scale_x_y", 1.0)),
                iou_loss=iou_loss,
                iou_normalizer=float(o.get("iou_normalizer", 0.75)),
                cls_normalizer=float(o.get("cls_normalizer", 1.0)),
                max_delta=float(o.get("max_delta", math.inf)),
                iou_thresh=float(o.get("iou_thresh", 1.0)),
                nms_kind=nms_kind,
                beta_nms=float(o.get("beta_nms", 0.6)),
                resize=float(o.get("resize", 1.0)),
            ))
        elif name == "region":
            layers.append(RegionLayer(
                anchors=_floats(o.get("anchors", "")),
                classes=int(o.get("classes", 20)),
                num=int(o.get("num", 5)),
                coords=int(o.get("coords", 4)),
                softmax=bool(int(o.get("softmax", 1))),
                rescore=bool(int(o.get("rescore", 0))),
                bias_match=bool(int(o.get("bias_match", 0))),
                jitter=float(o.get("jitter", 0.3)),
                object_scale=float(o.get("object_scale", 5)),
                noobject_scale=float(o.get("noobject_scale", 1)),
                class_scale=float(o.get("class_scale", 1)),
                coord_scale=float(o.get("coord_scale", 1)),
                thresh=float(o.get("thresh", 0.6)),
                absolute=bool(int(o.get("absolute", 1))),
                random=bool(int(o.get("random", 0))),
            ))
        else:
            raise ValueError(f"unsupported cfg section [{name}]")

    # unknown-key audit: unsupported SECTIONS fail loudly above;
    # unsupported KEYS must be just as visible (warn, or error under
    # strict) — they are the mechanism that would otherwise let an
    # upstream cfg silently train/eval with different semantics.
    unknown = []
    for si, (name, o) in enumerate(sections):
        extra = sorted(set(o) - o.accessed)
        if extra:
            where = "[net]" if si == 0 else f"[{name}] (layer {si - 1})"
            unknown.append(f"{where}: {', '.join(extra)}")
    if unknown:
        msg = ("cfg keys not consumed by the parser — the framework does "
               "not implement them and they will NOT take effect: "
               + "; ".join(unknown))
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, UnknownCfgKeyWarning, stacklevel=2)

    spec = NetworkSpec(net=net, layers=layers)
    _resolve_channels(spec)
    return spec


def load_cfg(path: str, strict: bool = False) -> NetworkSpec:
    with open(path) as f:
        return parse_cfg(f.read(), strict=strict)


def _resolve_channels(spec: NetworkSpec) -> None:
    """Fill ConvLayer.in_channels by walking the graph (needed by the weights
    codec and the structured-repack keep-set propagation, SURVEY.md §3.3)."""
    channels: List[int] = []
    c = spec.net.channels
    for i, l in enumerate(spec.layers):
        if isinstance(l, ConvLayer):
            l.in_channels = c
            c = l.filters
        elif isinstance(l, MaxPoolLayer):
            pass
        elif isinstance(l, RouteLayer):
            for a in l.layers:
                if channels[a] % l.groups:
                    raise ValueError(
                        f"route at layer {i}: source layer {a} has "
                        f"{channels[a]} channels, not divisible by "
                        f"groups={l.groups}")
            c = sum(channels[a] // l.groups for a in l.layers)
        elif isinstance(l, ReorgLayer):
            c = c * l.stride * l.stride
        elif isinstance(l, ShortcutLayer):
            if channels[l.from_layer] != c:
                raise ValueError(
                    f"shortcut at layer {i}: channel mismatch "
                    f"{c} vs {channels[l.from_layer]} (layer {l.from_layer})")
        elif isinstance(l, (RegionLayer, UpsampleLayer, YoloLayer)):
            pass
        channels.append(c)


def out_channels(spec: NetworkSpec) -> List[int]:
    """Per-layer output channel counts (same walk as _resolve_channels)."""
    channels: List[int] = []
    c = spec.net.channels
    for l in spec.layers:
        if isinstance(l, ConvLayer):
            c = l.filters
        elif isinstance(l, RouteLayer):
            c = sum(channels[a] // l.groups for a in l.layers)
        elif isinstance(l, ReorgLayer):
            c = c * l.stride * l.stride
        channels.append(c)
    return channels


def dump_cfg(spec: NetworkSpec) -> str:
    """Serialize a NetworkSpec back to Darknet cfg text (used by structured
    repack to emit the slimmed architecture, SURVEY.md §3.3 / BASELINE.json:9).
    """
    out = io.StringIO()
    n = spec.net
    out.write("[net]\n")
    out.write(f"batch={n.batch}\nsubdivisions={n.subdivisions}\n")
    out.write(f"height={n.height}\nwidth={n.width}\nchannels={n.channels}\n")
    out.write(f"momentum={n.momentum}\ndecay={n.decay}\n")
    out.write(f"learning_rate={n.learning_rate}\nmax_batches={n.max_batches}\n")
    out.write(f"policy={n.policy}\n")
    if n.steps:
        out.write("steps=" + ",".join(str(s) for s in n.steps) + "\n")
    if n.scales:
        out.write("scales=" + ",".join(f"{s:g}" for s in n.scales) + "\n")
    # training/augment hyperparameters: a checkpoint's arch.cfg must
    # round-trip EVERY NetConfig field or resume trains with defaults
    out.write(f"burn_in={n.burn_in}\n")
    out.write(f"power={n.power:g}\ngamma={n.gamma:g}\nstep={n.step}\n")
    out.write(f"angle={n.angle:g}\nsaturation={n.saturation:g}\n"
              f"exposure={n.exposure:g}\nhue={n.hue:g}\n")
    if n.mosaic:
        out.write("mosaic=1\n")
    for i, l in enumerate(spec.layers):
        out.write("\n")
        if isinstance(l, ConvLayer):
            out.write("[convolutional]\n")
            if l.batch_normalize:
                out.write("batch_normalize=1\n")
            out.write(f"filters={l.filters}\nsize={l.size}\n"
                      f"stride={l.stride}\npad={l.pad}\n"
                      f"activation={l.activation}\n")
        elif isinstance(l, MaxPoolLayer):
            out.write(f"[maxpool]\nsize={l.size}\nstride={l.stride}\n")
            if l.padding >= 0:
                out.write(f"padding={l.padding}\n")
        elif isinstance(l, RouteLayer):
            rel = ",".join(str(a - i) for a in l.layers)
            out.write(f"[route]\nlayers={rel}\n")
            if l.groups != 1:
                out.write(f"groups={l.groups}\ngroup_id={l.group_id}\n")
        elif isinstance(l, ReorgLayer):
            out.write(f"[reorg]\nstride={l.stride}\n")
        elif isinstance(l, ShortcutLayer):
            out.write(f"[shortcut]\nfrom={l.from_layer - i}\n"
                      f"activation={l.activation}\n")
        elif isinstance(l, UpsampleLayer):
            out.write(f"[upsample]\nstride={l.stride}\n")
        elif isinstance(l, YoloLayer):
            out.write("[yolo]\n")
            out.write("mask = " + ",".join(str(m) for m in l.mask) + "\n")
            out.write("anchors = " + ",".join(
                f"{a:g}" for a in l.anchors) + "\n")
            out.write(f"classes={l.classes}\nnum={l.num}\n"
                      f"jitter={l.jitter}\n"
                      f"ignore_thresh = {l.ignore_thresh}\n"
                      f"truth_thresh = {l.truth_thresh}\n"
                      f"random={int(l.random)}\n"
                      + (f"scale_x_y = {l.scale_x_y:g}\n"
                         if l.scale_x_y != 1.0 else ""))
            # v4-era train/serve keys: a checkpoint's arch.cfg must
            # round-trip every non-default field or resume trains with
            # the wrong loss (non-defaults only, like scale_x_y)
            if l.iou_loss != "mse":
                out.write(f"iou_loss={l.iou_loss}\n")
            if l.iou_normalizer != 0.75:
                out.write(f"iou_normalizer={l.iou_normalizer:g}\n")
            if l.cls_normalizer != 1.0:
                out.write(f"cls_normalizer={l.cls_normalizer:g}\n")
            if math.isfinite(l.max_delta):
                out.write(f"max_delta={l.max_delta:g}\n")
            if l.iou_thresh != 1.0:
                out.write(f"iou_thresh={l.iou_thresh:g}\n")
            if l.nms_kind != "greedynms":
                out.write(f"nms_kind={l.nms_kind}\n")
            if l.beta_nms != 0.6:
                out.write(f"beta_nms={l.beta_nms:g}\n")
            if l.resize != 1.0:
                out.write(f"resize={l.resize:g}\n")
        elif isinstance(l, RegionLayer):
            out.write("[region]\n")
            out.write("anchors = " + ",".join(
                f"{a:g}" for a in l.anchors) + "\n")
            out.write(f"bias_match={int(l.bias_match)}\nclasses={l.classes}\n"
                      f"coords={l.coords}\nnum={l.num}\n"
                      f"softmax={int(l.softmax)}\njitter={l.jitter}\n"
                      f"rescore={int(l.rescore)}\n"
                      f"object_scale={l.object_scale}\n"
                      f"noobject_scale={l.noobject_scale}\n"
                      f"class_scale={l.class_scale}\n"
                      f"coord_scale={l.coord_scale}\n"
                      f"absolute={int(l.absolute)}\nthresh={l.thresh}\n"
                      f"random={int(l.random)}\n")
    return out.getvalue()
