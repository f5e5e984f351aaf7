"""VOC mAP protocol tests (SURVEY.md §4.4): tiny synthetic detection sets
with hand-computed AP, both 11-point and all-point variants."""

import numpy as np
from pytest import approx

from modelcompression_tpu.evaluation.voc_map import (
    COCO_IOUS, Detection, GroundTruth, class_ap, coco_map, mean_ap, voc_ap,
)

BOX_A = (0.0, 0.0, 0.2, 0.2)
BOX_B = (0.5, 0.5, 0.7, 0.7)
BOX_FAR = (0.8, 0.0, 0.9, 0.1)


def test_perfect_detection():
    gts = [GroundTruth("im1", BOX_A), GroundTruth("im1", BOX_B)]
    dets = [Detection("im1", 0.9, BOX_A), Detection("im1", 0.8, BOX_B)]
    assert class_ap(dets, gts, use_07_metric=True) == approx(1.0)
    assert class_ap(dets, gts, use_07_metric=False) == approx(1.0)


def test_half_recall_hand_computed():
    """2 GT, one matched at rank 1, one FP at rank 2.

    PR points: (r=0.5, p=1.0), (r=0.5, p=0.5).
    All-point AP = 0.5 * 1.0 = 0.5.
    11-point: t in {0, .1, ..., .5} -> p=1 (6 points), rest 0 -> 6/11.
    """
    gts = [GroundTruth("im1", BOX_A), GroundTruth("im1", BOX_B)]
    dets = [Detection("im1", 0.9, BOX_A), Detection("im1", 0.8, BOX_FAR)]
    np.testing.assert_allclose(class_ap(dets, gts, use_07_metric=False), 0.5)
    np.testing.assert_allclose(class_ap(dets, gts, use_07_metric=True),
                               6 / 11)


def test_duplicate_detection_is_fp():
    gts = [GroundTruth("im1", BOX_A)]
    dets = [Detection("im1", 0.9, BOX_A), Detection("im1", 0.8, BOX_A)]
    # rank1 tp (r=1, p=1); rank2 dup -> fp (r=1, p=0.5). AP = 1.0 both ways.
    assert class_ap(dets, gts, use_07_metric=False) == approx(1.0)
    assert class_ap(dets, gts, use_07_metric=True) == approx(1.0)


def test_difficult_ignored():
    gts = [GroundTruth("im1", BOX_A),
           GroundTruth("im1", BOX_B, difficult=True)]
    # detecting the difficult GT neither helps nor hurts
    dets = [Detection("im1", 0.9, BOX_B), Detection("im1", 0.8, BOX_A)]
    assert class_ap(dets, gts, use_07_metric=False) == approx(1.0)


def test_iou_threshold_boundary():
    gts = [GroundTruth("im1", (0.0, 0.0, 1.0, 1.0))]
    # IoU exactly 0.5 counts as match (>= threshold)
    dets = [Detection("im1", 0.9, (0.0, 0.0, 1.0, 0.5))]
    assert class_ap(dets, gts) == approx(1.0)
    # IoU just under 0.5 does not
    dets = [Detection("im1", 0.9, (0.0, 0.0, 1.0, 0.49))]
    assert class_ap(dets, gts, use_07_metric=False) == 0.0


def test_wrong_image_is_fp():
    gts = [GroundTruth("im1", BOX_A)]
    dets = [Detection("im2", 0.9, BOX_A)]
    assert class_ap(dets, gts, use_07_metric=False) == 0.0


def test_voc_ap_integration_forms():
    recall = np.array([0.2, 0.4, 0.4, 0.8])
    precision = np.array([1.0, 1.0, 0.66, 0.8])
    # all-point: envelope precision = [1, 1, .8, .8];
    # AP = 0.4*1 + 0.4*0.8 = 0.72
    np.testing.assert_allclose(voc_ap(recall, precision, False), 0.72)
    # 11-pt: t<=0.4 -> max p at r>=t is 1.0 (5 pts); 0.5<=t<=0.8 -> 0.8
    # (4 pts); t>0.8 -> 0 => (5*1 + 4*0.8)/11
    np.testing.assert_allclose(voc_ap(recall, precision, True),
                               (5 + 4 * 0.8) / 11)


def test_coco_iou_ladder():
    assert COCO_IOUS == (0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9,
                         0.95)


def test_coco_map_hand_computed():
    """One GT (0,0,10,10), one detection (0,0,10,6): continuous IoU is
    exactly 60/100 = 0.6, so all-point AP is 1.0 at t in {.50,.55,.60}
    and 0.0 above -> mAP@[.50:.95] = 3/10."""
    gts = {"a": [GroundTruth("im1", (0.0, 0.0, 10.0, 10.0))]}
    dets = {"a": [Detection("im1", 0.9, (0.0, 0.0, 10.0, 6.0))]}
    m, per_class = coco_map(dets, gts, devkit_iou=False)
    assert per_class["a"] == approx(0.3)
    assert m == approx(0.3)


def test_coco_map_perfect_detection_is_one():
    gts = {"a": [GroundTruth("im1", BOX_A)]}
    dets = {"a": [Detection("im1", 0.9, BOX_A)]}
    m, _ = coco_map(dets, gts)
    assert m == approx(1.0)


def test_coco_map_skips_empty_and_all_difficult_classes():
    gts = {"a": [GroundTruth("im1", BOX_A)],
           "b": [],
           "c": [GroundTruth("im1", BOX_B, difficult=True)]}
    dets = {"a": [Detection("im1", 0.9, BOX_A)], "b": [], "c": []}
    m, per_class = coco_map(dets, gts)
    assert set(per_class) == {"a"}
    assert m == approx(1.0)


def test_mean_ap_skips_empty_classes():
    gts = {"a": [GroundTruth("im1", BOX_A)], "b": []}
    dets = {"a": [Detection("im1", 0.9, BOX_A)], "b": []}
    m, per_class = mean_ap(dets, gts)
    assert m == approx(1.0)
    assert set(per_class) == {"a"}
