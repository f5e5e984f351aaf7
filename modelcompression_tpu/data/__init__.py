from modelcompression_tpu.data.preprocess import (
    distort_hsv, hsv_to_rgb, letterbox_device, letterbox_host, mosaic4,
    normalize, random_flip, random_jitter, rgb_to_hsv,
    stretch_resize_device,
)
from modelcompression_tpu.data.coco import load_coco_json
from modelcompression_tpu.data.voc import (
    Sample, VOC_CLASSES, load_list_dataset, load_voc_devkit, pad_labels,
    parse_voc_xml, read_data_cfg, read_names,
)
from modelcompression_tpu.data.streaming import prefetch_to_device
from modelcompression_tpu.data.fixtures import (
    FIXTURE_CLASSES, make_fake_coco, make_fake_voc, tiny_region_cfg,
)

__all__ = [
    "distort_hsv", "hsv_to_rgb", "letterbox_device", "letterbox_host",
    "mosaic4", "normalize", "random_flip", "random_jitter", "rgb_to_hsv",
    "stretch_resize_device", "Sample", "VOC_CLASSES",
    "load_coco_json",
    "load_list_dataset", "load_voc_devkit", "pad_labels", "parse_voc_xml",
    "read_data_cfg", "read_names", "prefetch_to_device",
    "FIXTURE_CLASSES", "make_fake_coco", "make_fake_voc",
    "tiny_region_cfg",
]
