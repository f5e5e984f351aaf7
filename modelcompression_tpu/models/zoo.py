"""Bundled model architectures (the reference's model families,
BASELINE.json:5,10: YOLOv2-VOC, Tiny-YOLOv2-VOC, and the COCO-subset
Tiny-YOLOv2 used by the iterative loop, config 4)."""

from __future__ import annotations

import os

from modelcompression_tpu.models.cfg import NetworkSpec, load_cfg

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "configs")


def yolov2_voc() -> NetworkSpec:
    return load_cfg(os.path.join(CONFIG_DIR, "yolov2-voc.cfg"))


def tiny_yolov2_voc() -> NetworkSpec:
    return load_cfg(os.path.join(CONFIG_DIR, "tiny-yolo-voc.cfg"))


def yolov2_coco() -> NetworkSpec:
    """Full YOLOv2 with the 80-class COCO head and public COCO anchor
    priors (the darknet yolov2.cfg shape) — completes the model-family
    matrix next to the COCO-subset Tiny variant (BASELINE.json:10)."""
    return load_cfg(os.path.join(CONFIG_DIR, "yolov2-coco.cfg"))


def tiny_yolov2_coco() -> NetworkSpec:
    return load_cfg(os.path.join(CONFIG_DIR, "tiny-yolo-coco.cfg"))


def yolov3_coco() -> NetworkSpec:
    """Full YOLOv3 (Darknet-53 + 3-scale FPN head, 80 classes) — second
    detector family beyond the reference's YOLOv2 (generated canonical
    cfg shape: tools/gen_yolov3_cfg.py)."""
    return load_cfg(os.path.join(CONFIG_DIR, "yolov3.cfg"))


def yolov3_voc() -> NetworkSpec:
    return load_cfg(os.path.join(CONFIG_DIR, "yolov3-voc.cfg"))


def yolov3_spp_coco() -> NetworkSpec:
    """YOLOv3-SPP (public darknet yolov3-spp.cfg): YOLOv3 with a spatial
    pyramid pooling block — three stride-1 maxpools (5/9/13) over the
    13x13x512 head map, 4-way route concat (2048ch), 1x1 bottleneck —
    inserted after the third head conv. Exercises repeated-source route
    provenance in compress/graph.py and big stride-1 pools."""
    return load_cfg(os.path.join(CONFIG_DIR, "yolov3-spp.cfg"))


def yolov3_tiny_coco() -> NetworkSpec:
    return load_cfg(os.path.join(CONFIG_DIR, "yolov3-tiny.cfg"))


def yolov3_tiny_voc() -> NetworkSpec:
    return load_cfg(os.path.join(CONFIG_DIR, "yolov3-tiny-voc.cfg"))


def yolov4_coco() -> NetworkSpec:
    """Full YOLOv4 (Bochkovskiy et al. 2020; public AlexeyAB yolov4.cfg
    shape): CSPDarknet53 backbone (route-back CSP stages, 1/2/8/8/4
    residual blocks, mish) + SPP + PANet head (leaky), three [yolo]
    heads with scale_x_y 1.2/1.1/1.05 and the canonical CIoU training
    keys (iou_loss=ciou, iou_normalizer=0.07, iou_thresh=0.213,
    max_delta=5). 64.43M params / 128.39 conv-GFLOP at 608 — matching
    the published 64M / 128.46 BFLOPS. Generated + index-asserted by
    tools/gen_yolov4_cfg.py."""
    return load_cfg(os.path.join(CONFIG_DIR, "yolov4.cfg"))


def yolov4_voc() -> NetworkSpec:
    """Full YOLOv4 with the 20-class VOC head at 416 input (det convs
    75ch; 64.11M params / 59.67 conv-GFLOP) — the VOC adaptation, like
    the tiny variants."""
    return load_cfg(os.path.join(CONFIG_DIR, "yolov4-voc.cfg"))


def yolov4_tiny_coco() -> NetworkSpec:
    """yolov4-tiny (public AlexeyAB/darknet cfg shape): CSPOSANet
    backbone — grouped [route] splits (groups=2, group_id=1), two
    scale_x_y=1.05 [yolo] heads. 6.06M params / 6.91 GFLOP at 416,
    matching the published 6.9 BFLOPs."""
    return load_cfg(os.path.join(CONFIG_DIR, "yolov4-tiny.cfg"))


def yolov4_tiny_voc() -> NetworkSpec:
    """yolov4-tiny with the 20-class VOC head (det convs 75ch)."""
    return load_cfg(os.path.join(CONFIG_DIR, "yolov4-tiny-voc.cfg"))


def coco_names_path() -> str:
    return os.path.join(CONFIG_DIR, "coco.names")


def voc_names_path() -> str:
    return os.path.join(CONFIG_DIR, "voc.names")
