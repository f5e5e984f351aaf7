"""Generate the bundled YOLOv3 / YOLOv3-tiny cfg files.

The YOLOv3 graph (Redmon & Farhadi 2018, public darknet cfg shape:
Darknet-53 backbone = strided downsample convs + 1/2/8/8/4 residual
blocks, then a 3-scale FPN head) is too regular to hand-type 107 sections
without drift, so the bundled configs/yolov3*.cfg are emitted by this
script and the canonical layer indices are ASSERTED (the FPN routes must
hit layer 61 — end of the 512-channel stage — and layer 36 — end of the
256-channel stage — or loading public yolov3.weights would misalign).

Run:  python tools/gen_yolov3_cfg.py   (writes into the package configs/)
"""

from __future__ import annotations

import io
import os

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "modelcompression_tpu", "configs")

V3_ANCHORS = "10,13,  16,30,  33,23,  30,61,  62,45,  59,119,  " \
             "116,90,  156,198,  373,326"
TINY_ANCHORS = "10,14,  23,27,  37,58,  81,82,  135,169,  344,319"


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
             bn: bool = True, activation: str = "leaky") -> int:
        kv = {}
        if bn:
            kv["batch_normalize"] = 1
        kv.update(filters=filters, size=size, stride=stride,
                  pad=1 if size > 1 else 1, activation=activation)
        return self.sec("convolutional", **kv)

    def yolo(self, mask: str, anchors: str, classes: int, num: int) -> int:
        return self.sec("yolo", mask=mask, anchors=anchors, classes=classes,
                        num=num, jitter=".3", ignore_thresh=".7",
                        truth_thresh="1", random="1")


def _net(w: W, batch=64, subdivisions=16):
    w.sec("net", batch=batch, subdivisions=subdivisions, width=416,
          height=416, channels=3, momentum="0.9", decay="0.0005",
          angle="0", saturation="1.5", exposure="1.5", hue=".1",
          learning_rate="0.001", burn_in=1000, max_batches=500200,
          policy="steps", steps="400000,450000", scales=".1,.1")


def yolov3_cfg(classes: int = 80) -> str:
    """Full YOLOv3: Darknet-53 backbone + 3-scale FPN head."""
    w = W()
    _net(w)
    det = 3 * (5 + classes)

    w.conv(32)
    stage_end = {}
    for ch, n_blocks in ((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)):
        w.conv(ch, stride=2)
        for _ in range(n_blocks):
            w.conv(ch // 2, size=1)
            w.conv(ch)
            stage_end[ch] = w.sec("shortcut", **{"from": -3,
                                                 "activation": "linear"})
    # canonical yolov3.cfg indices — public yolov3.weights depend on them
    assert stage_end[256] == 36 and stage_end[512] == 61, stage_end
    assert stage_end[1024] == 74, stage_end

    def head(c1: int, mask: str):
        for _ in range(3):
            w.conv(c1, size=1)
            w.conv(c1 * 2)
        w.conv(det, size=1, bn=False, activation="linear")
        w.yolo(mask, V3_ANCHORS, classes, 9)

    head(512, "6,7,8")                      # 75..82, yolo at 82
    assert w.n == 82, w.n
    w.sec("route", layers=-4)               # 83 -> layer 79 (conv512 1x1)
    w.conv(256, size=1)                     # 84
    w.sec("upsample", stride=2)             # 85
    w.sec("route", layers="-1, 61")         # 86
    head(256, "3,4,5")                      # 87..94, yolo at 94
    assert w.n == 94, w.n
    w.sec("route", layers=-4)               # 95 -> layer 91
    w.conv(128, size=1)                     # 96
    w.sec("upsample", stride=2)             # 97
    w.sec("route", layers="-1, 36")         # 98
    head(128, "0,1,2")                      # 99..106, yolo at 106
    assert w.n == 106, w.n
    return w.buf.getvalue()


def yolov3_tiny_cfg(classes: int = 80) -> str:
    """YOLOv3-tiny: 2-scale head, no shortcuts (canonical public cfg)."""
    w = W()
    _net(w, batch=64, subdivisions=8)
    det = 3 * (5 + classes)

    for ch in (16, 32, 64, 128, 256, 512):
        w.conv(ch)
        stride = 1 if ch == 512 else 2
        w.sec("maxpool", size=2, stride=stride)
    w.conv(1024)                            # 12
    c13 = w.conv(256, size=1)               # 13
    w.conv(512)                             # 14
    w.conv(det, size=1, bn=False, activation="linear")  # 15
    w.yolo("3,4,5", TINY_ANCHORS, classes, 6)           # 16
    r = w.sec("route", layers=-4)                       # 17 -> 13
    assert r - 4 == c13 == 13, (r, c13)
    w.conv(128, size=1)                     # 18
    w.sec("upsample", stride=2)             # 19
    w.sec("route", layers="-1, 8")          # 20 (conv256 @ 26x26)
    w.conv(256)                             # 21
    w.conv(det, size=1, bn=False, activation="linear")  # 22
    w.yolo("0,1,2", TINY_ANCHORS, classes, 6)           # 23
    assert w.n == 23, w.n
    return w.buf.getvalue()


def main():
    targets = {
        "yolov3.cfg": yolov3_cfg(80),
        "yolov3-voc.cfg": yolov3_cfg(20),
        "yolov3-tiny.cfg": yolov3_tiny_cfg(80),
        "yolov3-tiny-voc.cfg": yolov3_tiny_cfg(20),
    }
    for name, text in targets.items():
        path = os.path.join(CONFIG_DIR, name)
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({text.count('[')} sections)")


if __name__ == "__main__":
    main()
