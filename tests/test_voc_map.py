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


def test_coco_area_ranges_are_the_published_bands():
    from modelcompression_tpu.evaluation import COCO_AREA_RANGES
    assert COCO_AREA_RANGES["small"] == (0.0, 1024.0)
    assert COCO_AREA_RANGES["medium"] == (1024.0, 9216.0)
    assert COCO_AREA_RANGES["large"][0] == 9216.0


def test_coco_map_by_area_hand_computed():
    """One small GT (20x20=400 px² < 32²) detected perfectly, one large
    GT (200x200 px²) missed entirely: AP_small = 1.0 (the large GT is
    ignored in the small band — the miss doesn't hurt it), AP_large =
    0.0, AP_medium = None (no in-band GT)."""
    from modelcompression_tpu.evaluation import coco_map_by_area
    small = (0.0, 0.0, 20.0, 20.0)
    large = (50.0, 50.0, 250.0, 250.0)
    gts = {"a": [GroundTruth("im1", small), GroundTruth("im1", large)]}
    dets = {"a": [Detection("im1", 0.9, small)]}
    by_area = coco_map_by_area(dets, gts, devkit_iou=False)
    assert by_area["small"] == approx(1.0)
    assert by_area["large"] == approx(0.0)
    assert by_area["medium"] is None


def test_area_band_ignores_out_of_band_unmatched_detection():
    """pycocotools dtIg semantics: an unmatched detection whose own area
    is outside the band is IGNORED (not a false positive) — a spurious
    large-box detection must not drag AP_small down. A matched detection
    is never area-ignored."""
    small = (0.0, 0.0, 20.0, 20.0)
    big_fp = (100.0, 100.0, 300.0, 300.0)  # matches nothing, out of band
    gts = [GroundTruth("im1", small)]
    dets = [Detection("im1", 0.95, big_fp),  # higher-ranked than the tp
            Detection("im1", 0.90, small)]
    band = (0.0, 32.0 ** 2)
    ap = class_ap(dets, gts, iou_thresh=0.5, use_07_metric=False,
                  area_range=band)
    assert ap == approx(1.0)
    # the same spurious box DOES count against the unbanded AP
    ap_all = class_ap(dets, gts, iou_thresh=0.5, use_07_metric=False)
    assert ap_all < 1.0


def test_area_band_out_of_band_gt_is_ignored_like_difficult():
    """A detection matching an out-of-band GT is neither tp nor fp, and
    the out-of-band GT doesn't enter recall's denominator."""
    small = (0.0, 0.0, 20.0, 20.0)
    large = (50.0, 50.0, 250.0, 250.0)
    gts = [GroundTruth("im1", small), GroundTruth("im1", large)]
    dets = [Detection("im1", 0.95, large),  # matches the ignored GT
            Detection("im1", 0.90, small)]
    ap = class_ap(dets, gts, iou_thresh=0.5, use_07_metric=False,
                  area_range=(0.0, 32.0 ** 2))
    assert ap == approx(1.0)


def test_band_matching_prefers_non_ignored_gt_above_threshold():
    """ADVICE r3, AREA-BAND mode: a detection overlapping an out-of-band
    GT slightly more than an in-band GT must still match the in-band GT
    when both clear the IoU threshold (pycocotools prefers non-ignored
    GTs during matching); the plain argmax would leave it unmatched."""
    small = (0.0, 0.0, 20.0, 20.0)   # area 400 px^2, in the small band
    big = (0.0, 0.0, 20.0, 60.0)     # area 1200 px^2, out of band
    det = (0.0, 0.0, 20.0, 50.0)     # IoU(big)=0.833, IoU(small)=0.4
    gts = [GroundTruth("im1", big), GroundTruth("im1", small)]
    dets = [Detection("im1", 0.9, det)]
    # threshold 0.35: both GTs clear it; plain argmax -> big (ignored in
    # band) would leave small unmatched; the preference matches small
    ap = class_ap(dets, gts, iou_thresh=0.35, use_07_metric=False,
                  area_range=(0.0, 32.0 ** 2))
    assert ap == approx(1.0)


def test_plain_protocol_keeps_devkit_argmax_for_difficult():
    """Headline VOC protocol (no area band): the devkit's bare argmax —
    a det whose highest-IoU GT is difficult is IGNORED even when a clean
    GT also clears the threshold (canonical voc_eval.py behavior; the
    pycocotools preference must not leak into the parity path)."""
    clean = (0.0, 0.0, 10.0, 10.0)
    diff = (0.0, 0.0, 10.0, 11.0)  # overlaps the det slightly more
    det = (0.0, 0.0, 10.0, 10.5)
    gts = [GroundTruth("im1", diff, difficult=True),
           GroundTruth("im1", clean)]
    dets = [Detection("im1", 0.9, det)]
    # the det is ignored (matched the difficult GT), clean GT unmatched:
    # recall 0 -> AP 0 under the devkit protocol
    assert class_ap(dets, gts, use_07_metric=False) == approx(0.0)


def test_band_matching_skips_matched_gts_but_keeps_ignored_fallback():
    """The band preference must skip already-MATCHED GTs: a duplicate
    det whose argmax falls on an out-of-band GT stays ignored (dropped),
    not converted into a false positive by re-preferring the matched
    in-band GT (code-review r4 finding #1)."""
    small = (0.0, 0.0, 20.0, 20.0)
    big = (0.0, 0.0, 20.0, 60.0)  # out of the small band
    gts = [GroundTruth("im1", small), GroundTruth("im1", big)]
    band = (0.0, 32.0 ** 2)
    dets = [Detection("im1", 0.9, small),            # TP on small
            Detection("im1", 0.8, (0.0, 0.0, 20.0, 50.0))]  # argmax: big
    # det2's best unmatched non-ignored GT above thresh: none (small is
    # matched) -> falls back to argmax big (ignored) -> dropped. AP 1.0.
    ap = class_ap(dets, gts, iou_thresh=0.35, use_07_metric=False,
                  area_range=band)
    assert ap == approx(1.0)


def test_matching_falls_back_to_ignored_gt_below_threshold():
    """When only the ignored GT clears the threshold the detection is
    dropped from the curve (neither tp nor fp), in band mode too."""
    diff = (0.0, 0.0, 10.0, 10.0)
    far_live = (50.0, 50.0, 60.0, 60.0)
    gts = [GroundTruth("im1", diff, difficult=True),
           GroundTruth("im1", far_live)]
    dets = [Detection("im1", 0.9, diff),
            Detection("im1", 0.8, far_live)]
    assert class_ap(dets, gts, use_07_metric=False) == approx(1.0)
    assert class_ap(dets, gts, use_07_metric=False,
                    area_range=(0.0, float("inf"))) == approx(1.0)


def test_area_band_bounds_are_inclusive_like_pycocotools():
    """A box of exactly 32^2 px^2 belongs to BOTH the small and medium
    bands (pycocotools' aRng bounds are inclusive on both ends)."""
    boundary = (0.0, 0.0, 32.0, 32.0)  # area exactly 1024 px^2
    gts = [GroundTruth("im1", boundary)]
    dets = [Detection("im1", 0.9, boundary)]
    for band in ((0.0, 32.0 ** 2), (32.0 ** 2, 96.0 ** 2)):
        assert class_ap(dets, gts, use_07_metric=False,
                        area_range=band) == approx(1.0)


def test_mean_ap_skips_empty_classes():
    gts = {"a": [GroundTruth("im1", BOX_A)], "b": []}
    dets = {"a": [Detection("im1", 0.9, BOX_A)], "b": []}
    m, per_class = mean_ap(dets, gts)
    assert m == approx(1.0)
    assert set(per_class) == {"a"}
