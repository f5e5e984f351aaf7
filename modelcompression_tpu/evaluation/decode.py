"""On-device YOLOv2 region decode (SURVEY.md §3.1, Appendix A.1; the
north-star requires "anchor-box decode and NMS run on-device to keep eval
fully in XLA", BASELINE.json:5).

The raw network output is (B, H, W, A*(5+C)) NHWC, channel layout identical
to Darknet's filter ordering: anchor-major, per anchor
[tx, ty, tw, th, to, class logits...]. Decode (Appendix A.1):

    bx = (sigmoid(tx) + cx) / W      (normalized to [0, 1] of network input)
    by = (sigmoid(ty) + cy) / H
    bw = pw * exp(tw) / W            (pw, ph = anchors in cell units)
    bh = ph * exp(th) / H
    objectness = sigmoid(to)
    class probs = softmax(logits)

Everything is fixed-shape: every cell/anchor produces a box; confidence
thresholding is done downstream by masking scores, never by dynamic
filtering (XLA static-shape rule).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from modelcompression_tpu.models.cfg import (
    NetworkSpec, RegionLayer, YoloLayer,
)


def decode_region(raw: jnp.ndarray, region: RegionLayer
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode raw feature map to boxes.

    Args:
      raw: (B, H, W, A*(5+C)) float32.
      region: the [region] layer config (anchors in cell units).

    Returns:
      boxes: (B, H*W*A, 4) center-format (cx, cy, w, h), normalized [0,1].
      objectness: (B, H*W*A).
      class_probs: (B, H*W*A, C) softmax probabilities.
    """
    b, h, w, _ = raw.shape
    a = region.num
    c = region.classes
    raw = raw.reshape(b, h, w, a, 5 + c)

    cy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    anchors = jnp.asarray(region.anchor_pairs, jnp.float32)  # (A, 2)

    tx, ty, tw, th, to = (raw[..., i] for i in range(5))
    bx = (jax.nn.sigmoid(tx) + cx[None, :, :, None]) / w
    by = (jax.nn.sigmoid(ty) + cy[None, :, :, None]) / h
    bw = anchors[None, None, None, :, 0] * jnp.exp(tw) / w
    bh = anchors[None, None, None, :, 1] * jnp.exp(th) / h
    obj = jax.nn.sigmoid(to)
    cls = jax.nn.softmax(raw[..., 5:], axis=-1)

    n = h * w * a
    boxes = jnp.stack([bx, by, bw, bh], axis=-1).reshape(b, n, 4)
    return boxes, obj.reshape(b, n), cls.reshape(b, n, c)


def decode_yolo(raw: jnp.ndarray, layer: YoloLayer,
                net_h: int, net_w: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode one [yolo] head's raw map (YOLOv3, yolo_layer.c semantics).

    Differences from [region] (decode_region): anchors are in
    NETWORK-INPUT PIXELS (normalized here by net_w/net_h, not the grid),
    only this scale's ``mask`` anchors apply, and class probabilities are
    independent SIGMOIDS (multi-label), not a softmax.

    Args:
      raw: (B, H, W, A*(5+C)) float32, A = len(layer.mask).
    Returns:
      boxes (B, H*W*A, 4) center-format normalized [0,1],
      objectness (B, H*W*A), class_probs (B, H*W*A, C).
    """
    b, h, w, _ = raw.shape
    a = layer.n
    c = layer.classes
    raw = raw.reshape(b, h, w, a, 5 + c)

    cy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    anchors = jnp.asarray(layer.anchor_pairs, jnp.float32)  # (A, 2) pixels

    tx, ty, tw, th, to = (raw[..., i] for i in range(5))
    # scale_x_y (YOLOv4 grid-sensitivity fix, darknet yolo_layer.c):
    # bx = (s*sigmoid(tx) - (s-1)/2 + cx)/W — stretches the per-cell
    # offset past [0,1] so boxes can sit on cell boundaries without
    # saturating the logistic; s=1 is the classic YOLOv3 decode
    s = layer.scale_x_y
    off = (s - 1.0) * 0.5
    bx = (s * jax.nn.sigmoid(tx) - off + cx[None, :, :, None]) / w
    by = (s * jax.nn.sigmoid(ty) - off + cy[None, :, :, None]) / h
    bw = anchors[None, None, None, :, 0] * jnp.exp(tw) / net_w
    bh = anchors[None, None, None, :, 1] * jnp.exp(th) / net_h
    obj = jax.nn.sigmoid(to)
    cls = jax.nn.sigmoid(raw[..., 5:])

    n = h * w * a
    boxes = jnp.stack([bx, by, bw, bh], axis=-1).reshape(b, n, 4)
    return boxes, obj.reshape(b, n), cls.reshape(b, n, c)


def decode_heads(raws, spec: NetworkSpec
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Family-generic decode: one call for both detector families.

    ``raws`` is forward()'s return value — a single (B,H,W,A*(5+C)) map
    for [region] specs (YOLOv2) or a tuple of per-scale maps for [yolo]
    specs (YOLOv3). Multi-scale candidates concatenate along N so the
    downstream NMS/mAP machinery is family-agnostic.
    """
    if not spec.is_multi_head:
        raw = raws[0] if isinstance(raws, (tuple, list)) else raws
        return decode_region(raw, spec.region)
    heads = [spec.layers[i] for i in spec.head_indices()]
    if not isinstance(raws, (tuple, list)) or len(raws) != len(heads):
        raise ValueError(
            f"multi-head spec has {len(heads)} [yolo] layers but forward "
            f"returned {1 if not isinstance(raws, (tuple, list)) else len(raws)} maps")
    net_h, net_w = spec.net.height, spec.net.width
    parts = [decode_yolo(r, l, net_h, net_w) for r, l in zip(raws, heads)]
    boxes = jnp.concatenate([p[0] for p in parts], axis=1)
    obj = jnp.concatenate([p[1] for p in parts], axis=1)
    cls = jnp.concatenate([p[2] for p in parts], axis=1)
    return boxes, obj, cls


def center_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2), same units."""
    cx, cy, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def corners_to_image(boxes_xyxy: jnp.ndarray, img_w, img_h,
                     net_w: int, net_h: int,
                     letterboxed: bool) -> jnp.ndarray:
    """Map normalized network-input corner boxes back to original image
    pixel coordinates.

    With ``letterboxed=True`` the image was scaled by r=min(net/w, net/h) and
    centered with padding; undo that. Otherwise a plain stretch resize was
    used. ``img_w``/``img_h`` may be scalars or (B,) arrays.
    """
    img_w = jnp.asarray(img_w, jnp.float32)
    img_h = jnp.asarray(img_h, jnp.float32)
    while img_w.ndim < boxes_xyxy.ndim - 1:
        img_w = img_w[..., None]
        img_h = img_h[..., None]
    x = boxes_xyxy[..., 0::2] * net_w
    y = boxes_xyxy[..., 1::2] * net_h
    if letterboxed:
        r = jnp.minimum(net_w / img_w, net_h / img_h)
        # EXACT inverse of letterbox_host/letterbox_device geometry: content
        # size is round(img*r) and pads are integer floor-halves — using the
        # continuous (net - img*r)/2 here would bias every box by up to
        # ~1px/r systematically.
        new_w = jnp.round(img_w * r)   # jnp.round == python round (half-even)
        new_h = jnp.round(img_h * r)
        pad_x = jnp.floor((net_w - new_w) / 2)
        pad_y = jnp.floor((net_h - new_h) / 2)
        x = (x - pad_x[..., None]) / r[..., None]
        y = (y - pad_y[..., None]) / r[..., None]
    else:
        x = x * img_w[..., None] / net_w
        y = y * img_h[..., None] / net_h
    x = jnp.clip(x, 0, img_w[..., None])
    y = jnp.clip(y, 0, img_h[..., None])
    out = jnp.empty_like(boxes_xyxy)
    out = out.at[..., 0::2].set(x)
    out = out.at[..., 1::2].set(y)
    return out
