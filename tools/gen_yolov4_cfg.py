"""Generate the bundled full-YOLOv4 cfg files.

The YOLOv4 graph (Bochkovskiy et al. 2020, public AlexeyAB/darknet
yolov4.cfg shape): CSPDarknet53 backbone — each stage downsamples with a
strided conv, splits into a transition branch and a residual branch via
the route-back pattern (``conv; [route] -2; conv``, the full-model CSP
form — plain routes, not the grouped splits of yolov4-tiny), runs
1/2/8/8/4 residual blocks, partial-transitions and concatenates — all
mish; then an SPP block (stride-1 5/9/13 maxpools + 4-way concat) and a
PANet head (two top-down upsample+concat paths, then two bottom-up
strided-conv+concat paths) — all leaky; three [yolo] heads with the
grid-sensitivity scale_x_y 1.2/1.1/1.05 and the canonical CIoU training
keys (iou_loss=ciou, iou_normalizer=0.07, cls_normalizer=1.0,
max_delta=5, beta_nms=0.6).

A 163-section cfg (162 layers + [net]) is too regular to hand-type
without drift, so the bundled configs/yolov4*.cfg are emitted by this
script and the canonical layer
indices are ASSERTED (the PAN routes must hit layer 85 — end of the
512-channel stage — and layer 54 — end of the 256-channel stage; the
SPP concat must gather -1,-3,-5,-6; the bottom-up concats hit 126/116 —
or loading public yolov4.weights would misalign).

Run:  python tools/gen_yolov4_cfg.py   (writes into the package configs/)
"""

from __future__ import annotations

import io
import os

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "modelcompression_tpu", "configs")

V4_ANCHORS = ("12,16,  19,36,  40,28,  36,75,  76,55,  72,146,  "
              "142,110,  192,243,  459,401")


class W:
    def __init__(self):
        self.buf = io.StringIO()
        self.n = -1  # layer index of the LAST emitted section ([net] = -1)

    def sec(self, name: str, **kv) -> int:
        self.buf.write(f"[{name}]\n")
        for k, v in kv.items():
            self.buf.write(f"{k}={v}\n")
        self.buf.write("\n")
        if name != "net":
            self.n += 1
        return self.n

    def conv(self, filters: int, size: int = 3, stride: int = 1,
             bn: bool = True, activation: str = "mish") -> int:
        kv = {}
        if bn:
            kv["batch_normalize"] = 1
        kv.update(filters=filters, size=size, stride=stride, pad=1,
                  activation=activation)
        return self.sec("convolutional", **kv)

    def yolo(self, mask: str, classes: int, scale_x_y: float) -> int:
        return self.sec(
            "yolo", mask=mask, anchors=V4_ANCHORS, classes=classes,
            num=9, jitter=".3", ignore_thresh=".7", truth_thresh="1",
            random="1", scale_x_y=f"{scale_x_y:g}", iou_thresh="0.213",
            cls_normalizer="1.0", iou_normalizer="0.07", iou_loss="ciou",
            nms_kind="greedynms", beta_nms="0.6", max_delta="5")


def _net(w: W, size: int):
    w.sec("net", batch=64, subdivisions=8, width=size, height=size,
          channels=3, momentum="0.949", decay="0.0005", angle="0",
          saturation="1.5", exposure="1.5", hue=".1",
          learning_rate="0.0013", burn_in=1000, max_batches=500500,
          policy="steps", steps="400000,450000", scales=".1,.1",
          mosaic=1)


def yolov4_cfg(classes: int = 80, size: int = 608) -> str:
    """Full YOLOv4: CSPDarknet53 + SPP + PAN, 3-scale head."""
    w = W()
    _net(w, size)
    det = 3 * (5 + classes)

    w.conv(32)                                        # 0
    stage_out = {}
    # (stage out-channels, split width, residual blocks, block widths)
    stages = ((64, 64, 1, (32, 64)),
              (128, 64, 2, (64, 64)),
              (256, 128, 8, (128, 128)),
              (512, 256, 8, (256, 256)),
              (1024, 512, 4, (512, 512)))
    for out_c, split_c, blocks, (b1, b2) in stages:
        w.conv(out_c, stride=2)                       # downsample
        w.conv(split_c, size=1)                       # transition branch
        w.sec("route", layers=-2)
        w.conv(split_c, size=1)                       # residual branch
        for _ in range(blocks):
            w.conv(b1, size=1)
            w.conv(b2)
            w.sec("shortcut", **{"from": -3, "activation": "linear"})
        w.conv(split_c, size=1)                       # partial transition
        # concat with the first transition branch: -1 and the conv
        # emitted right after the downsample (3 route/convs + 3*blocks
        # layers back)
        w.sec("route", layers=f"-1,{-(3 * blocks + 4)}")
        stage_out[out_c] = w.conv(out_c, size=1)      # stage output
    # canonical yolov4.cfg indices — public yolov4.weights depend on them
    assert stage_out[256] == 54 and stage_out[512] == 85, stage_out
    assert stage_out[1024] == 104, stage_out

    # SPP neck (leaky from here on)
    w.conv(512, size=1, activation="leaky")           # 105
    w.conv(1024, activation="leaky")                  # 106
    c107 = w.conv(512, size=1, activation="leaky")    # 107
    w.sec("maxpool", size=5, stride=1)                # 108
    w.sec("route", layers=-2)                         # 109 -> 107
    w.sec("maxpool", size=9, stride=1)                # 110
    r = w.sec("route", layers=-4)                     # 111 -> 107
    assert r - 4 == c107 == 107, (r, c107)
    w.sec("maxpool", size=13, stride=1)               # 112
    w.sec("route", layers="-1,-3,-5,-6")              # 113: 2048ch concat
    w.conv(512, size=1, activation="leaky")           # 114
    w.conv(1024, activation="leaky")                  # 115
    p5 = w.conv(512, size=1, activation="leaky")      # 116
    assert p5 == 116

    def five(c: int):
        """The PAN 5-conv block: 1x1/3x3 alternating, ends 1x1."""
        w.conv(c, size=1, activation="leaky")
        w.conv(2 * c, activation="leaky")
        w.conv(c, size=1, activation="leaky")
        w.conv(2 * c, activation="leaky")
        return w.conv(c, size=1, activation="leaky")

    # top-down path 1: P5 -> 38x38, concat with a 1x1 of backbone P4
    w.conv(256, size=1, activation="leaky")           # 117
    w.sec("upsample", stride=2)                       # 118
    w.sec("route", layers=stage_out[512])             # 119 -> 85
    w.conv(256, size=1, activation="leaky")           # 120
    w.sec("route", layers="-1,-3")                    # 121: 120 & 118
    n4 = five(256)                                    # 122..126
    assert n4 == 126
    # top-down path 2: -> 76x76, concat with a 1x1 of backbone P3
    w.conv(128, size=1, activation="leaky")           # 127
    w.sec("upsample", stride=2)                       # 128
    w.sec("route", layers=stage_out[256])             # 129 -> 54
    w.conv(128, size=1, activation="leaky")           # 130
    w.sec("route", layers="-1,-3")                    # 131: 130 & 128
    n3 = five(128)                                    # 132..136
    assert n3 == 136

    # head 1 (fine scale)
    w.conv(256, activation="leaky")                   # 137
    w.conv(det, size=1, bn=False, activation="linear")  # 138
    w.yolo("0,1,2", classes, 1.2)                     # 139
    # bottom-up path 1
    w.sec("route", layers=-4)                         # 140 -> 136
    w.conv(256, stride=2, activation="leaky")         # 141
    r = w.sec("route", layers="-1,-16")               # 142: 141 & 126
    assert r - 16 == n4, (r, n4)
    m4 = five(256)                                    # 143..147
    w.conv(512, activation="leaky")                   # 148
    w.conv(det, size=1, bn=False, activation="linear")  # 149
    w.yolo("3,4,5", classes, 1.1)                     # 150
    # bottom-up path 2
    w.sec("route", layers=-4)                         # 151 -> 147
    w.conv(512, stride=2, activation="leaky")         # 152
    r = w.sec("route", layers="-1,-37")               # 153: 152 & 116
    assert r - 37 == p5, (r, p5)
    five(512)                                         # 154..158
    w.conv(1024, activation="leaky")                  # 159
    w.conv(det, size=1, bn=False, activation="linear")  # 160
    y = w.yolo("6,7,8", classes, 1.05)                # 161
    assert y == 161, y
    return w.buf.getvalue()


def main():
    targets = {
        "yolov4.cfg": yolov4_cfg(80, 608),
        "yolov4-voc.cfg": yolov4_cfg(20, 416),
    }
    for name, text in targets.items():
        path = os.path.join(CONFIG_DIR, name)
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({text.count('[')} sections)")


if __name__ == "__main__":
    main()
