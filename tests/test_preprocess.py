"""Preprocessing/augmentation tests (SURVEY.md §7.4.5, VERDICT r1 weak #10):
pin the documented semantics of the device-side augment ops — exact mosaic
box geometry, flip involution + box mirroring, HSV identity at no-op knobs
and range preservation, and the matmul bilinear resize against
jax.image.resize."""

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.data.preprocess import (
    _bilinear_resize, distort_hsv, letterbox_device, mosaic4, random_flip,
)


def test_matmul_resize_equals_jax_image_resize():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 48, 80, 3)).astype(np.float32))
    for hw in ((24, 40), (32, 52), (96, 160)):
        got = np.asarray(_bilinear_resize(x, *hw))
        want = np.asarray(jax.image.resize(
            x, (2, hw[0], hw[1], 3), method="bilinear", antialias=False))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_mosaic_composition_and_box_geometry():
    """Fixed-center mosaic: the composed image is exactly the 2x2 concat of
    half-res rolled inputs, and each box lands at cx/2 + quadrant offset."""
    rng = np.random.default_rng(1)
    b, h, w = 4, 32, 32
    images = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    boxes = np.zeros((b, 2, 5), np.float32)
    for i in range(b):
        boxes[i, 0] = [i % 3, 0.3 + 0.1 * i, 0.4, 0.2, 0.25]
    out, out_boxes = mosaic4(images, jnp.asarray(boxes), jax.random.key(0),
                             center_range=None)
    out, out_boxes = np.asarray(out), np.asarray(out_boxes)

    half = np.asarray(_bilinear_resize(images, h // 2, w // 2))
    for i in range(b):
        want = np.concatenate([
            np.concatenate([half[i], half[(i + 1) % b]], axis=1),
            np.concatenate([half[(i + 2) % b], half[(i + 3) % b]], axis=1),
        ], axis=0)
        np.testing.assert_allclose(out[i], want, atol=1e-6)
    # quadrant q01 of sample 0 holds sample 1's box at cx/2 + 0.5
    src = boxes[1, 0]
    got = out_boxes[0, 2]  # (M=2 rows per quadrant; q01 rows start at M)
    np.testing.assert_allclose(
        got, [src[0], src[1] * 0.5 + 0.5, src[2] * 0.5,
              src[3] * 0.5, src[4] * 0.5], rtol=1e-6)
    # invalid rows stay invalid (w == 0)
    assert (out_boxes[:, 1::2][boxes[:, 1, 3] == 0].sum() == 0
            or (out_boxes[..., 3] >= 0).all())


def test_mosaic_random_center_degenerate_matches_fixed():
    """center_range=(0.5, 0.5) (scale_and_translate path) must reproduce
    the fixed-center matmul path — pins the half-pixel sampling
    convention of the traced-geometry composition."""
    rng = np.random.default_rng(7)
    b, h, w = 4, 32, 48
    images = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    boxes = np.zeros((b, 2, 5), np.float32)
    for i in range(b):
        boxes[i, 0] = [i % 3, 0.3 + 0.1 * i, 0.4, 0.2, 0.25]
    boxes = jnp.asarray(boxes)
    fixed_im, fixed_bx = mosaic4(images, boxes, jax.random.key(0),
                                 center_range=None)
    rand_im, rand_bx = mosaic4(images, boxes, jax.random.key(0),
                               center_range=(0.5, 0.5))
    np.testing.assert_allclose(np.asarray(rand_im), np.asarray(fixed_im),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rand_bx), np.asarray(fixed_bx),
                               atol=1e-6)


def test_mosaic_random_center_box_matches_image_content():
    """Random-center mosaic: a bright square in a source image must still be
    covered by its remapped box in the composed canvas (geometry
    end-to-end), boxes stay in [0,1], invalid rows stay invalid."""
    b, h, w = 4, 64, 64
    images = np.zeros((b, h, w, 3), np.float32)
    images[1, 24:40, 16:32] = 1.0  # bright square in sample 1
    boxes = np.zeros((b, 2, 5), np.float32)
    boxes[1, 0] = [2, (16 + 32) / 2 / 64, (24 + 40) / 2 / 64,
                   16 / 64, 16 / 64]
    out, ob = mosaic4(jnp.asarray(images), jnp.asarray(boxes),
                      jax.random.key(3), center_range=(0.3, 0.7))
    out, ob = np.asarray(out), np.asarray(ob)
    # sample 0's q01 tile is source sample 1 -> its box rows start at M=2
    box = ob[0, 2]
    assert box[0] == 2 and box[3] > 0
    x1 = int(np.floor((box[1] - box[3] / 2) * w))
    x2 = int(np.ceil((box[1] + box[3] / 2) * w))
    y1 = int(np.floor((box[2] - box[4] / 2) * h))
    y2 = int(np.ceil((box[2] + box[4] / 2) * h))
    inner = out[0, y1 + 1:y2 - 1, x1 + 1:x2 - 1]
    assert inner.mean() > 0.85, inner.mean()
    # nothing bright outside the box (sample 1 is the only bright source
    # and only its square is lit)
    outside = out[0].sum() - out[0, y1:y2, x1:x2].sum()
    assert outside < 0.1 * out[0, y1:y2, x1:x2].sum()
    # all valid boxes normalized; invalid rows all-zero
    valid = ob[..., 3] > 0
    assert (ob[valid][:, 1:] >= 0).all() and (ob[valid][:, 1:] <= 1).all()
    assert (ob[~valid] == 0).all()


def test_flip_involution_and_box_mirror():
    rng = np.random.default_rng(2)
    b, h, w = 8, 16, 16
    images = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    boxes = np.zeros((b, 1, 5), np.float32)
    boxes[:, 0] = [1, 0.3, 0.6, 0.2, 0.2]
    out, out_boxes = random_flip(images, jnp.asarray(boxes),
                                 jax.random.key(3))
    out, out_boxes = np.asarray(out), np.asarray(out_boxes)
    flipped = np.isclose(out_boxes[:, 0, 1], 0.7)
    kept = np.isclose(out_boxes[:, 0, 1], 0.3)
    assert (flipped | kept).all() and flipped.any() and kept.any()
    for i in range(b):
        want = np.asarray(images)[i, :, ::-1] if flipped[i] \
            else np.asarray(images)[i]
        np.testing.assert_allclose(out[i], want)


def test_hsv_identity_at_noop_knobs_and_range():
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.uniform(0, 1, (3, 8, 8, 3)).astype(np.float32))
    same = distort_hsv(images, jax.random.key(0), hue=0.0, sat=1.0,
                       expo=1.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(images),
                               atol=1e-5)
    out = np.asarray(distort_hsv(images, jax.random.key(1)))
    assert (out >= 0).all() and (out <= 1).all()


def test_rgb_hsv_roundtrip_and_known_colors():
    from modelcompression_tpu.data.preprocess import hsv_to_rgb, rgb_to_hsv
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    # known anchors: pure red/green/blue/gray
    rgb = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0.5]],
                      jnp.float32)
    hsv = np.asarray(rgb_to_hsv(rgb))
    np.testing.assert_allclose(hsv[0], [0.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[1], [1 / 3, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[2], [2 / 3, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[3], [0.0, 0.0, 0.5], atol=1e-6)
    # exposure scales V exactly: gray image, sat/hue fixed at no-op
    g = jnp.full((1, 4, 4, 3), 0.4, jnp.float32)
    out = np.asarray(distort_hsv(g, jax.random.key(7), hue=0.0, sat=1.0,
                                 expo=2.0))
    ratios = out / 0.4
    assert (np.abs(ratios - ratios[..., :1]) < 1e-5).all()  # stays gray
    assert 0.5 - 1e-3 <= ratios.mean() <= 2.0 + 1e-3


def test_jitter_identity_at_zero_and_box_geometry():
    from modelcompression_tpu.data.preprocess import random_jitter
    rng = np.random.default_rng(6)
    images = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    boxes = np.zeros((4, 2, 5), np.float32)
    boxes[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    # jitter=0: exact identity (scale 1, translation 0)
    out, ob = random_jitter(images, jnp.asarray(boxes), jax.random.key(0),
                            jitter=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(images),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ob), boxes, atol=1e-6)
    # jitter>0: boxes stay normalized and valid rows stay plausible
    out, ob = random_jitter(images, jnp.asarray(boxes), jax.random.key(1),
                            jitter=0.2)
    ob = np.asarray(ob)
    kept = ob[..., 3] > 0
    assert kept.any()
    assert (ob[kept][:, 1:] >= 0).all() and (ob[kept][:, 1:] <= 1).all()
    # invalid input rows stay invalid
    assert (ob[:, 1, 3] == 0).all()


def test_jitter_box_matches_image_content():
    """Place a bright square, jitter, and check the remapped box still
    covers the bright pixels (geometry exactness end-to-end)."""
    from modelcompression_tpu.data.preprocess import random_jitter
    img = np.zeros((1, 64, 64, 3), np.float32)
    img[0, 24:40, 16:32] = 1.0  # y 24-40, x 16-32
    boxes = np.zeros((1, 1, 5), np.float32)
    boxes[0, 0] = [0, (16 + 32) / 2 / 64, (24 + 40) / 2 / 64,
                   16 / 64, 16 / 64]
    out, ob = random_jitter(jnp.asarray(img), jnp.asarray(boxes),
                            jax.random.key(2), jitter=0.15)
    out, ob = np.asarray(out)[0], np.asarray(ob)[0, 0]
    assert ob[3] > 0  # box survived
    x1 = int(round((ob[1] - ob[3] / 2) * 64))
    x2 = int(round((ob[1] + ob[3] / 2) * 64))
    y1 = int(round((ob[2] - ob[4] / 2) * 64))
    y2 = int(round((ob[2] + ob[4] / 2) * 64))
    inner = out[y1 + 2:y2 - 2, x1 + 2:x2 - 2]
    assert inner.mean() > 0.9, inner.mean()
    # pixels far outside the box are dark or gray
    assert out[:max(y1 - 4, 0)].mean() < 0.6


def test_letterbox_device_pad_value_and_geometry():
    img = jnp.full((1, 50, 100, 3), 200, jnp.uint8)
    out = np.asarray(letterbox_device(img, 64, 64))
    # r = 0.64 -> content 32 rows centered: pad rows 0..15 and 48..63
    np.testing.assert_allclose(out[0, :16], 127 / 255.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 48:], 127 / 255.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 16:48], 200 / 255.0, atol=1e-3)


from hypothesis import given, settings, strategies as st


@given(st.integers(0, 2**31 - 1), st.floats(0.31, 0.69))
@settings(max_examples=15, deadline=None)
def test_mosaic_random_center_properties(seed, probe):
    """Property test over random centers: (a) the composed canvas is an
    exact partition — every pixel comes from exactly one squashed source
    tile; (b) remapped box centers land inside their tile's quadrant;
    (c) total valid-box count is preserved (mosaic never drops boxes)."""
    from modelcompression_tpu.data.preprocess import mosaic4
    rng = np.random.default_rng(seed)
    b, h, w = 4, 32, 48
    # constant-valued images let us identify the source of every pixel
    images = np.zeros((b, h, w, 3), np.float32)
    for i in range(b):
        images[i] = (i + 1) / 10.0
    boxes = np.zeros((b, 3, 5), np.float32)
    n_valid = 0
    for i in range(b):
        m = rng.integers(1, 4)
        n_valid += m
        for j in range(m):
            boxes[i, j] = [j, rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8),
                           rng.uniform(0.05, 0.3), rng.uniform(0.05, 0.3)]
    out, ob = mosaic4(jnp.asarray(images), jnp.asarray(boxes),
                      jax.random.key(seed), center_range=(0.3, 0.7))
    out, ob = np.asarray(out), np.asarray(ob)

    # (a) partition: every pixel equals one of the 4 source constants
    # (interior pixels exactly; tile-seam pixels may blend two sources
    # within the documented half-pixel edge band)
    consts = np.array([(i + 1) / 10.0 for i in range(b)], np.float32)
    for i in range(b):
        vals = out[i, :, :, 0]
        src = np.abs(vals[None] - consts[:, None, None]).min(axis=0)
        assert (src < 0.11).all()  # within blend range of some source pair
        exact = (np.abs(vals[None] - consts[:, None, None]) < 1e-4).any(0)
        assert exact.mean() > 0.9  # seams are a thin band only

    # (b)+(c): every input valid box survives, with center in [0,1]
    valid = ob[..., 3] > 0
    assert valid.sum() == 4 * n_valid  # each sample contributes 4 tiles
    assert (ob[valid][:, 1:3] >= 0).all() and (ob[valid][:, 1:3] <= 1).all()
