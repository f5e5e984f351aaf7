"""Region decode tests (SURVEY.md §4.3): hand-constructed grids with known
boxes, cross-checked against a numpy transcription of the public YOLOv2
decode formula (Appendix A.1)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import expit, softmax  # type: ignore

from modelcompression_tpu.evaluation.decode import (
    center_to_corners, corners_to_image, decode_region,
)
from modelcompression_tpu.models.cfg import RegionLayer

scipy = pytest.importorskip("scipy")

REGION = RegionLayer(anchors=(1.0, 1.5, 3.0, 4.0), classes=3, num=2)


def np_decode(raw, region):
    """Numpy oracle of the public formula."""
    b, h, w, _ = raw.shape
    a, c = region.num, region.classes
    raw = raw.reshape(b, h, w, a, 5 + c)
    anchors = np.asarray(region.anchor_pairs)
    boxes = np.zeros((b, h, w, a, 4))
    for bi in range(b):
        for i in range(h):
            for j in range(w):
                for ai in range(a):
                    tx, ty, tw, th = raw[bi, i, j, ai, :4]
                    boxes[bi, i, j, ai] = [
                        (expit(tx) + j) / w, (expit(ty) + i) / h,
                        anchors[ai, 0] * np.exp(tw) / w,
                        anchors[ai, 1] * np.exp(th) / h]
    obj = expit(raw[..., 4])
    cls = softmax(raw[..., 5:], axis=-1)
    n = h * w * a
    return (boxes.reshape(b, n, 4), obj.reshape(b, n),
            cls.reshape(b, n, c))


def test_decode_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    raw = rng.standard_normal((2, 3, 4, 2 * 8)).astype(np.float32)
    boxes, obj, cls = decode_region(jnp.asarray(raw), REGION)
    eboxes, eobj, ecls = np_decode(raw, REGION)
    np.testing.assert_allclose(np.asarray(boxes), eboxes, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(obj), eobj, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls), ecls, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls).sum(-1), 1.0, rtol=1e-5)


def test_decode_known_box():
    """tx=ty=0 -> box centered at cell center + 0.5; tw=th=0 -> anchor size."""
    raw = np.zeros((1, 2, 2, 2 * 8), np.float32)
    boxes, obj, _ = decode_region(jnp.asarray(raw), REGION)
    boxes = np.asarray(boxes).reshape(2, 2, 2, 4)
    # cell (0,0) anchor 0: cx = (sigmoid(0)+0)/2 = 0.25
    np.testing.assert_allclose(boxes[0, 0, 0], [0.25, 0.25, 0.5, 0.75],
                               atol=1e-6)
    # cell (1,1) anchor 1: cx = (0.5+1)/2 = 0.75, w = 3*1/2
    np.testing.assert_allclose(boxes[1, 1, 1], [0.75, 0.75, 1.5, 2.0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(obj), 0.5, atol=1e-6)


def test_center_to_corners():
    b = jnp.asarray([[0.5, 0.5, 0.2, 0.4]])
    np.testing.assert_allclose(np.asarray(center_to_corners(b)),
                               [[0.4, 0.3, 0.6, 0.7]], atol=1e-7)


def test_corners_to_image_letterbox_roundtrip():
    """A box on a 200x100 image letterboxed into 416: mapping back must
    recover original pixel coords."""
    img_w, img_h, net = 200, 100, 416
    r = min(net / img_w, net / img_h)  # 2.08
    pad_x = (net - img_w * r) / 2      # 0
    pad_y = (net - img_h * r) / 2      # 104
    # original pixel box
    x1, y1, x2, y2 = 20.0, 10.0, 180.0, 90.0
    # its position in normalized net coords
    nb = jnp.asarray([[(x1 * r + pad_x) / net, (y1 * r + pad_y) / net,
                       (x2 * r + pad_x) / net, (y2 * r + pad_y) / net]])
    back = np.asarray(corners_to_image(nb, img_w, img_h, net, net, True))
    np.testing.assert_allclose(back, [[x1, y1, x2, y2]], atol=1e-3)


def test_corners_to_image_matches_letterbox_host_rounding():
    """The inverse mapping must use the SAME integer geometry the letterbox
    used (content size round(img*r), pad (net-new)//2) — a 500x333 image is
    the classic case where the continuous pad is off by ~0.5px."""
    from modelcompression_tpu.data.preprocess import letterbox_host
    img_w, img_h, net = 500, 333, 416
    img = np.zeros((img_h, img_w, 3), np.uint8)
    _, r, px, py = letterbox_host(img, net, net)
    # a box placed on the letterboxed canvas using the REAL (r, px, py)
    x1, y1, x2, y2 = 50.0, 40.0, 450.0, 300.0
    nb = jnp.asarray([[(x1 * r + px) / net, (y1 * r + py) / net,
                       (x2 * r + px) / net, (y2 * r + py) / net]])
    back = np.asarray(corners_to_image(nb, img_w, img_h, net, net, True))
    np.testing.assert_allclose(back, [[x1, y1, x2, y2]], atol=1e-3)


def test_corners_to_image_stretch():
    nb = jnp.asarray([[0.1, 0.2, 0.5, 0.8]])
    back = np.asarray(corners_to_image(nb, 200, 100, 416, 416, False))
    np.testing.assert_allclose(back, [[20, 20, 100, 80]], atol=1e-3)
