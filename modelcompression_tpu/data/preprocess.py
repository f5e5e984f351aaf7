"""Image preprocessing — device-side (jittable) wherever possible.

The north-star (BASELINE.json:5) requires "image preprocessing (letterbox
resize, normalize, mosaic/flip augment) fused into the same program" as the
convs. Host work is limited to JPEG decode + an optional resize for
variable-size source images (SURVEY.md §7.4.5); everything after a uint8
tensor exists is jnp inside the jitted step:

  * ``letterbox_device`` — aspect-preserving resize + gray padding, static
    shapes (source shape is a compile-time constant per bucket).
  * ``normalize`` — uint8 -> float /255 (Darknet's only normalization).
  * ``random_flip`` / ``mosaic4`` — training augmentations, pure jnp on
    fixed-size uint8/float batches.

Host fallbacks (``letterbox_host``) cover variable-size eval images using
opencv; they produce the same uint8 canvas the device path produces for
fixed-size input (oracle-tested).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

GRAY = 127  # Darknet letterbox padding value (0.5 in float)


def normalize(images_uint8: jnp.ndarray) -> jnp.ndarray:
    return images_uint8.astype(jnp.float32) / 255.0


def _linear_resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear interpolation matrix, half-pixel centers, no
    antialias — the cv2.INTER_LINEAR / Darknet convention."""
    out = np.zeros((dst, src), np.float32)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        f = x - x0
        out[i, min(max(x0, 0), src - 1)] += 1.0 - f
        out[i, min(max(x0 + 1, 0), src - 1)] += f
    return out


def _bilinear_resize(x: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Separable bilinear resize of (B, H, W, C) as two matmuls.

    ``jax.image.resize`` lowers to gathers, which run on the slow path on
    TPU (measured ~1.6 ms for a batch-64 512x384 frame); expressing the same
    interpolation as two small dense matmuls puts it on the MXU (~0.3 ms).
    The weight matrices are built at trace time (static shapes) and match
    cv2.INTER_LINEAR sampling exactly.

    The contraction runs in a channels-leading (NCHW-ish) view: keeping the
    spatial dims trailing lets XLA give the matmul outputs a layout the
    following conv accepts — the direct NHWC einsum form forced a 227 us
    relayout copy of the resized frames before conv1 in the fused eval
    program (traced; 4.70 -> 4.65 ms/batch on the pruned pipeline).
    """
    b, h, w, c = x.shape
    if (h, w) == (new_h, new_w):
        return x
    # interpolation matrices follow the activation dtype, so a bf16 input
    # runs the whole resize in bf16 (half the HBM traffic; callers pick
    # the dtype per precision policy)
    wh = jnp.asarray(_linear_resize_matrix(h, new_h),
                     x.dtype)                            # (new_h, h)
    ww = jnp.asarray(_linear_resize_matrix(w, new_w), x.dtype)  # (new_w, w)
    t = x.transpose(0, 3, 1, 2)
    t = jnp.einsum("iy,bcyx->bcix", wh, t)
    t = jnp.einsum("jx,bcix->bcij", ww, t)
    return t.transpose(0, 2, 3, 1)


def quantize_canvas(x: jnp.ndarray, quant_scale) -> jnp.ndarray:
    """[0,1] float canvas -> int8 on the network-input grid
    (``quant_scale`` = the calibrated input step, normally 1/127).

    The rounding runs in f32 — exactly `forward_quantized`'s input
    quantize — so an int8-emitting letterbox is BIT-EQUAL to the float
    letterbox followed by the forward's own quantize (the f32 cast fuses
    into the resize epilogue; nothing extra touches HBM). This is the
    integer-domain input stage's producer half: the 416² canvas is
    written to HBM at 1 byte/px instead of 2 (bf16) or 4 (f32), and the
    first int8 conv consumes it with no separate quantize op.
    """
    q = jnp.round(x.astype(jnp.float32)
                  / jnp.asarray(quant_scale, jnp.float32))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def letterbox_device(images: jnp.ndarray, net_h: int, net_w: int,
                     dtype=jnp.float32, quant_scale=None) -> jnp.ndarray:
    """Aspect-preserving resize + center pad, jittable.

    Args:
      images: (B, H, W, 3) uint8 or float; H, W static.
      dtype: compute/output dtype. float32 is the bit-faithful default;
        the FAST eval pipeline passes bf16 (the conv stack consumes bf16
        anyway, so resizing in bf16 only moves the rounding one op
        earlier while halving the resize's HBM traffic).
      quant_scale: when set (float or traced f32 scalar), the canvas is
        emitted as INT8 on the network-input grid (``quantize_canvas``)
        — resize still runs in ``dtype``, the quantize fuses into its
        epilogue, and the gray padding is applied on the int8 grid
        (bit-equal to quantizing the padded float canvas: round is
        applied to the same value either way).
    Returns:
      (B, net_h, net_w, 3) ``dtype`` in [0, 1], or int8 when
      ``quant_scale`` is set.
    """
    b, h, w, c = images.shape
    r = min(net_w / w, net_h / h)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    x = images.astype(dtype) / jnp.asarray(255.0, dtype) \
        if images.dtype == jnp.uint8 else images.astype(dtype)
    x = _bilinear_resize(x, new_h, new_w)
    pad_value = GRAY / 255.0
    if quant_scale is not None:
        x = quantize_canvas(x, quant_scale)
        pad_value = quantize_canvas(
            jnp.asarray(pad_value, jnp.float32), quant_scale)
    pad_top = (net_h - new_h) // 2
    pad_left = (net_w - new_w) // 2
    return jnp.pad(
        x, ((0, 0), (pad_top, net_h - new_h - pad_top),
            (pad_left, net_w - new_w - pad_left), (0, 0)),
        constant_values=pad_value)  # same canvas value as letterbox_host


def stretch_resize_device(images: jnp.ndarray, net_h: int, net_w: int,
                          dtype=jnp.float32, quant_scale=None) -> jnp.ndarray:
    """Plain stretch resize to net size (the pytorch-yolo2 valid.py mode).
    ``dtype`` / ``quant_scale`` as in ``letterbox_device``."""
    x = images.astype(dtype) / jnp.asarray(255.0, dtype) \
        if images.dtype == jnp.uint8 else images.astype(dtype)
    x = _bilinear_resize(x, net_h, net_w)
    if quant_scale is not None:
        x = quantize_canvas(x, quant_scale)
    return x


def letterbox_host(image: np.ndarray, net_h: int, net_w: int
                   ) -> Tuple[np.ndarray, float, int, int]:
    """Host letterbox for variable-size images (eval path).

    Returns (canvas uint8 (net_h, net_w, 3), scale r, pad_left, pad_top).
    """
    import cv2
    h, w = image.shape[:2]
    r = min(net_w / w, net_h / h)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    resized = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((net_h, net_w, 3), GRAY, np.uint8)
    pad_top = (net_h - new_h) // 2
    pad_left = (net_w - new_w) // 2
    canvas[pad_top:pad_top + new_h, pad_left:pad_left + new_w] = resized
    return canvas, r, pad_left, pad_top


def random_flip(images: jnp.ndarray, boxes: jnp.ndarray, rng: jax.Array
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Horizontal flip with p=0.5 per sample.

    boxes: (B, M, 5) [cls, cx, cy, w, h] normalized; cx -> 1-cx when
    flipped (invalid boxes marked w<=0 are left untouched in validity).
    """
    b = images.shape[0]
    flip = jax.random.bernoulli(rng, 0.5, (b,))
    flipped = images[:, :, ::-1, :]
    images = jnp.where(flip[:, None, None, None], flipped, images)
    cx = jnp.where(flip[:, None], 1.0 - boxes[..., 1], boxes[..., 1])
    boxes = boxes.at[..., 1].set(jnp.where(boxes[..., 3] > 0, cx,
                                           boxes[..., 1]))
    return images, boxes


def random_jitter(images: jnp.ndarray, boxes: jnp.ndarray, rng: jax.Array,
                  jitter: float = 0.2, min_box: float = 0.01
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Darknet-style random crop/stretch jitter (the ``jitter=`` knob of the
    [region] section, data.c load_data_detection), jittable.

    Per sample, each edge moves inward/outward by U(-jitter, jitter) of the
    image size; the resulting window is resampled back to the full frame
    (``jax.image.scale_and_translate`` accepts traced per-sample scale and
    translation, so this stays ONE program). Boxes are remapped; boxes
    whose center leaves the frame or whose clipped size drops below
    ``min_box`` are invalidated (w=0 rows).

    Fidelity note vs Darknet: Darknet fills out-of-image crop regions with
    a border-replicate-ish constant; here they fill with GRAY (the
    letterbox pad value). Geometry and box bookkeeping are exact (tested).

    Args:
      images: (B, H, W, 3) float [0,1]; boxes (B, M, 5) [cls,cx,cy,w,h]
        normalized, invalid rows w == 0.
    """
    if not 0.0 <= jitter < 0.5:
        # two opposing edges each move by up to `jitter`, so >= 0.5 lets
        # the crop window collapse to zero/negative size (1/sw blows up)
        raise ValueError(f"jitter must be in [0, 0.5), got {jitter}")
    b, h, w, _ = images.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    pl = jax.random.uniform(k1, (b,), minval=-jitter, maxval=jitter)
    pr = jax.random.uniform(k2, (b,), minval=-jitter, maxval=jitter)
    pt = jax.random.uniform(k3, (b,), minval=-jitter, maxval=jitter)
    pb = jax.random.uniform(k4, (b,), minval=-jitter, maxval=jitter)
    sw = 1.0 - pl - pr   # crop window size, fraction of full width
    sh = 1.0 - pt - pb

    def one(img, pl_, pt_, sw_, sh_):
        # output coord o maps to input coord o*s + p (normalized): for
        # scale_and_translate, in = (o - t)/scale -> scale = 1/s, t = -p/s
        scale = jnp.stack([1.0 / sh_, 1.0 / sw_])
        trans = jnp.stack([-pt_ * h / sh_, -pl_ * w / sw_])
        # antialias=False: plain bilinear on zoom-out too, matching the
        # repo's cv2.INTER_LINEAR/Darknet convention (_linear_resize_matrix)
        out = jax.image.scale_and_translate(
            img, img.shape, (0, 1), scale, trans, method="linear",
            antialias=False)
        # fill out-of-window with GRAY: scale_and_translate zero-fills
        yy = (jnp.arange(h) - trans[0]) / scale[0]
        xx = (jnp.arange(w) - trans[1]) / scale[1]
        inside = ((yy >= -0.5) & (yy <= h - 0.5))[:, None] \
            & ((xx >= -0.5) & (xx <= w - 0.5))[None, :]
        return jnp.where(inside[..., None], out, GRAY / 255.0)

    images = jax.vmap(one)(images, pl, pt, sw, sh)

    valid = boxes[..., 3] > 0
    cx = (boxes[..., 1] - pl[:, None]) / sw[:, None]
    cy = (boxes[..., 2] - pt[:, None]) / sh[:, None]
    bw = boxes[..., 3] / sw[:, None]
    bh = boxes[..., 4] / sh[:, None]
    # clip extents to the frame, recompute center/size
    x1 = jnp.clip(cx - bw / 2, 0.0, 1.0)
    x2 = jnp.clip(cx + bw / 2, 0.0, 1.0)
    y1 = jnp.clip(cy - bh / 2, 0.0, 1.0)
    y2 = jnp.clip(cy + bh / 2, 0.0, 1.0)
    bw, bh = x2 - x1, y2 - y1
    keep = valid & (bw > min_box) & (bh > min_box) \
        & (cx > 0) & (cx < 1) & (cy > 0) & (cy < 1)
    out = jnp.stack([boxes[..., 0], (x1 + x2) / 2, (y1 + y2) / 2, bw, bh],
                    axis=-1)
    out = jnp.where(keep[..., None], out, jnp.zeros_like(out))
    return images, out


def mosaic4(images: jnp.ndarray, boxes: jnp.ndarray, rng: jax.Array,
            center_range: Tuple[float, float] | None = (0.3, 0.7)
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """4-image mosaic augmentation, fixed shapes (SURVEY.md §7.4.5).

    Composes sample i with samples (i+1, i+2, i+3) mod B into a 2x2 grid
    whose split point is drawn per sample as (fy, fx) ~ U(center_range);
    each source image is squashed to exactly fill its (variable-size)
    quadrant. Like ``random_jitter``, the per-sample geometry rides
    ``jax.image.scale_and_translate`` with traced scale/translation, so the
    whole batch stays ONE jitted program with static shapes.

    ``center_range=None`` selects the fixed midpoint center, which lowers
    to the cheaper matmul half-res + concat composition (identical result
    to ``center_range=(0.5, 0.5)``, tested).

    Fidelity note vs Darknet/YOLOv4-style mosaic: each tile is a full
    squashed image rather than a random crop — compose with
    ``random_jitter`` (applied first) for crop variety. Tile edges may be
    darkened by up to half a pixel (scale_and_translate zero-fills past
    the source edge); harmless for a training augmentation. Box geometry
    is exact (tested in test_preprocess.py).

    MEMORY NOTE (random-center path): the composition loops over the 4
    quadrants, so only ONE rolled batch copy, its resampled tile, and
    the accumulating canvas are live at a time (~3 batch-size buffers;
    the earlier form stacked all 4 rolled copies up front, ~4-8x the
    fixed-center path's footprint). The fixed-center matmul path
    (``center_range=None``) remains the cheapest form.

    Args:
      images: (B, H, W, 3) float; H, W even.
      boxes: (B, M, 5) [cls, cx, cy, w, h] normalized; invalid rows have
        w == 0.
    Returns:
      (B, H, W, 3) images, (B, 4*M, 5) boxes.
    """
    b, h, w, c = images.shape

    if center_range is None:
        # fixed-center fast path: half-res resize is two matmuls (MXU)
        half = _bilinear_resize(images, h // 2, w // 2)

        def quadrant(offset_b, off_y, off_x):
            q = jnp.roll(half, -offset_b, axis=0)
            bx = jnp.roll(boxes, -offset_b, axis=0)
            # box in quadrant: scaled by 1/2 and shifted
            scaled = bx.at[..., 1].set(bx[..., 1] * 0.5 + off_x) \
                       .at[..., 2].set(bx[..., 2] * 0.5 + off_y) \
                       .at[..., 3].set(bx[..., 3] * 0.5) \
                       .at[..., 4].set(bx[..., 4] * 0.5)
            # keep invalid rows invalid
            scaled = jnp.where(bx[..., 3:4] > 0, scaled,
                               jnp.zeros_like(scaled))
            return q, scaled

        q00, b00 = quadrant(0, 0.0, 0.0)
        q01, b01 = quadrant(1, 0.0, 0.5)
        q10, b10 = quadrant(2, 0.5, 0.0)
        q11, b11 = quadrant(3, 0.5, 0.5)
        top = jnp.concatenate([q00, q01], axis=2)
        bot = jnp.concatenate([q10, q11], axis=2)
        out = jnp.concatenate([top, bot], axis=1)
        out_boxes = jnp.concatenate([b00, b01, b10, b11], axis=1)
        return out, out_boxes

    lo, hi = center_range
    if not 0.0 < lo <= hi < 1.0:
        raise ValueError(f"center_range must satisfy 0 < lo <= hi < 1, "
                         f"got {center_range}")
    k1, k2 = jax.random.split(rng)
    fy = jax.random.uniform(k1, (b,), minval=lo, maxval=hi)
    fx = jax.random.uniform(k2, (b,), minval=lo, maxval=hi)

    ys = jnp.arange(h)[None, :, None, None]       # (1, H, 1, 1)
    xs = jnp.arange(w)[None, None, :, None]       # (1, 1, W, 1)
    fy_b = fy[:, None, None, None]
    fx_b = fx[:, None, None, None]

    def st(img, qh_, qw_, ty_, tx_):
        # output half-pixel o+0.5 in the quadrant samples source
        # half-pixel (o+0.5-t)/q — scale_and_translate's convention
        return jax.image.scale_and_translate(
            img, img.shape, (0, 1),
            jnp.stack([qh_, qw_]), jnp.stack([ty_, tx_]),
            method="linear", antialias=False)

    out = jnp.zeros_like(images)
    for k, (r_, c_) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        src = jnp.roll(images, -k, axis=0)         # one copy live at a time
        qh = (1.0 - fy) if r_ else fy              # quadrant size, normalized
        qw = (1.0 - fx) if c_ else fx
        ty = fy * h if r_ else jnp.zeros_like(fy)  # quadrant origin, pixels
        tx = fx * w if c_ else jnp.zeros_like(fx)
        tile = jax.vmap(st)(src, qh, qw, ty, tx)
        in_y = (ys < fy_b * h) if r_ == 0 else (ys >= fy_b * h)
        in_x = (xs < fx_b * w) if c_ == 0 else (xs >= fx_b * w)
        out = jnp.where(in_y & in_x, tile, out)

    def remap(offset_b, r_, c_):
        bx = jnp.roll(boxes, -offset_b, axis=0)
        qh = jnp.where(r_, 1.0 - fy, fy)[:, None]
        qw = jnp.where(c_, 1.0 - fx, fx)[:, None]
        oy = jnp.where(r_, fy, 0.0)[:, None]
        ox = jnp.where(c_, fx, 0.0)[:, None]
        scaled = bx.at[..., 1].set(bx[..., 1] * qw + ox) \
                   .at[..., 2].set(bx[..., 2] * qh + oy) \
                   .at[..., 3].set(bx[..., 3] * qw) \
                   .at[..., 4].set(bx[..., 4] * qh)
        return jnp.where(bx[..., 3:4] > 0, scaled, jnp.zeros_like(scaled))

    out_boxes = jnp.concatenate(
        [remap(k, r_, c_)
         for k, (r_, c_) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))],
        axis=1)
    return out, out_boxes


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """Elementwise RGB [0,1] -> HSV with H in [0,1) (jittable)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, axis=-1)
    lo = jnp.min(rgb, axis=-1)
    c = v - lo
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c,
                  4.0 + (r - g) / safe_c))
    h = jnp.where(c > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """Elementwise HSV (H in [0,1)) -> RGB [0,1] (jittable)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def distort_hsv(images: jnp.ndarray, rng: jax.Array,
                hue: float = 0.1, sat: float = 1.5, expo: float = 1.5
                ) -> jnp.ndarray:
    """Darknet random hue/saturation/exposure jitter (cfg [net] knobs),
    EXACT semantics (image.c random_distort_image): convert to HSV, scale S
    by U(1/sat, sat), scale V by U(1/expo, expo), shift H additively by
    U(-hue, hue) with wraparound, convert back. All elementwise jnp — one
    fused VPU pass inside the train step. images float [0,1], (B,H,W,3)."""
    b = images.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    d_sat = jax.random.uniform(k1, (b, 1, 1), minval=1.0 / sat, maxval=sat)
    d_exp = jax.random.uniform(k2, (b, 1, 1), minval=1.0 / expo,
                               maxval=expo)
    d_hue = jax.random.uniform(k3, (b, 1, 1), minval=-hue, maxval=hue)
    hsv = rgb_to_hsv(jnp.clip(images, 0.0, 1.0))
    h = (hsv[..., 0] + d_hue) % 1.0
    s = jnp.clip(hsv[..., 1] * d_sat, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * d_exp, 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))
