from modelcompression_tpu.models.cfg import (
    ConvLayer, MaxPoolLayer, NetConfig, NetworkSpec, RegionLayer, ReorgLayer,
    RouteLayer, ShortcutLayer, UpsampleLayer, YoloLayer,
    dump_cfg, load_cfg, out_channels, parse_cfg,
)
from modelcompression_tpu.models.darknet import (
    Params, conv_key, fold_batchnorm, forward, forward_folded, init_params,
    maxpool, num_conv_flops, num_params, reorg, upsample_nearest,
)
from modelcompression_tpu.models.weights_io import load_weights, save_weights
from modelcompression_tpu.models.zoo import (
    CONFIG_DIR, coco_names_path, tiny_yolov2_coco, tiny_yolov2_voc,
    yolov2_coco, yolov2_voc, yolov3_coco, yolov3_spp_coco,
    yolov3_tiny_coco, yolov3_tiny_voc, yolov3_voc, yolov4_coco,
    yolov4_tiny_coco, yolov4_tiny_voc, yolov4_voc,
)

__all__ = [
    "ConvLayer", "MaxPoolLayer", "NetConfig", "NetworkSpec", "RegionLayer",
    "ReorgLayer", "RouteLayer", "ShortcutLayer", "UpsampleLayer",
    "YoloLayer", "dump_cfg", "load_cfg", "out_channels",
    "parse_cfg", "Params", "conv_key", "fold_batchnorm", "forward",
    "forward_folded", "init_params", "maxpool", "num_conv_flops",
    "num_params", "reorg", "upsample_nearest",
    "load_weights", "save_weights", "CONFIG_DIR", "coco_names_path",
    "tiny_yolov2_coco", "tiny_yolov2_voc",
    "yolov2_coco", "yolov2_voc",
    "yolov3_coco", "yolov3_spp_coco", "yolov3_tiny_coco",
    "yolov3_tiny_voc", "yolov3_voc", "yolov4_coco", "yolov4_tiny_coco",
    "yolov4_tiny_voc", "yolov4_voc",
]
