"""Minimal PyTorch (CPU) oracle for numerics cross-checks (SURVEY.md §4.1).

This is an in-repo stand-in for the reference implementation (the reference
tree was empty at build time, SURVEY.md §0): a straightforward NCHW
torch model built from the same NetworkSpec, with Darknet semantics
(leaky 0.1, BatchNorm2d eps=1e-5, bottom/right -inf-padded stride-1 maxpool,
pytorch-yolo2 reorg). The JAX model must match it to fp32 tolerance, and
bit-policy tests assert near-exactness under the BITMATCH precision policy.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from modelcompression_tpu.models.cfg import (
    ConvLayer, MaxPoolLayer, NetworkSpec, RegionLayer, ReorgLayer, RouteLayer,
    ShortcutLayer, UpsampleLayer, YoloLayer,
)
from modelcompression_tpu.models.darknet import BN_EPS, conv_key


def torch_reorg(x: torch.Tensor, stride: int = 2) -> torch.Tensor:
    """pytorch-yolo2 lineage reorg:
    out[b, (s*hi+wi)*C + c, i, j] = x[b, c, s*i+hi, s*j+wi]."""
    b, c, h, w = x.shape
    s = stride
    x = x.view(b, c, h // s, s, w // s, s).permute(0, 1, 2, 4, 3, 5)
    x = x.contiguous().view(b, c, (h // s) * (w // s), s * s)
    x = x.permute(0, 1, 3, 2).contiguous().view(b, c, s * s, h // s, w // s)
    x = x.permute(0, 2, 1, 3, 4).contiguous()
    return x.view(b, s * s * c, h // s, w // s)


def torch_maxpool(x: torch.Tensor, size: int, stride: int) -> torch.Tensor:
    """Darknet maxpool (maxpool_layer.c): window origin offset by
    -(size-1)//2 (centered padding for odd sizes; bottom/right-only for
    size 2, the pytorch-yolo2 case), OOB reads -inf."""
    h, w = x.shape[2], x.shape[3]
    pad_total = size - 1
    pad_begin = pad_total // 2
    out_h = (h + pad_total - size) // stride + 1
    out_w = (w + pad_total - size) // stride + 1
    pad_h = max(0, (out_h - 1) * stride + size - h - pad_begin)
    pad_w = max(0, (out_w - 1) * stride + size - w - pad_begin)
    if pad_h or pad_w or pad_begin:
        x = F.pad(x, (pad_begin, pad_w, pad_begin, pad_h),
                  value=float("-inf"))
    return F.max_pool2d(x, kernel_size=size, stride=stride)


def torch_forward(params, x_nchw: np.ndarray, spec: NetworkSpec,
                  train_stats: bool = False) -> np.ndarray:
    """Run the oracle forward pass. ``params`` is the JAX-side pytree
    (HWIO numpy arrays); transposed to OIHW here.

    For multi-head [yolo] specs (YOLOv3) returns a LIST of per-scale raw
    maps (NCHW) in network order, mirroring darknet.forward's tuple."""
    with torch.no_grad():
        y = torch.from_numpy(np.asarray(x_nchw, dtype=np.float32))
        outputs = []
        heads = []
        for i, l in enumerate(spec.layers):
            if isinstance(l, ConvLayer):
                p = params[conv_key(i)]
                w = torch.from_numpy(
                    np.ascontiguousarray(
                        np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1)))
                y = F.conv2d(y, w, bias=None, stride=l.stride,
                             padding=l.padding)
                if l.batch_normalize:
                    if train_stats:
                        mu = y.mean(dim=(0, 2, 3))
                        var = y.var(dim=(0, 2, 3), unbiased=False)
                    else:
                        mu = torch.from_numpy(np.asarray(p["mean"], np.float32))
                        var = torch.from_numpy(np.asarray(p["var"], np.float32))
                    g = torch.from_numpy(np.asarray(p["gamma"], np.float32))
                    b = torch.from_numpy(np.asarray(p["beta"], np.float32))
                    y = (y - mu[None, :, None, None]) / torch.sqrt(
                        var[None, :, None, None] + BN_EPS)
                    y = y * g[None, :, None, None] + b[None, :, None, None]
                else:
                    b = torch.from_numpy(np.asarray(p["bias"], np.float32))
                    y = y + b[None, :, None, None]
                if l.activation == "leaky":
                    y = F.leaky_relu(y, 0.1)
                elif l.activation == "linear":
                    pass
                elif l.activation == "relu":
                    y = F.relu(y)
                elif l.activation == "mish":
                    y = F.mish(y)  # x*tanh(softplus(x)), darknet (YOLOv4)
                else:
                    raise ValueError(l.activation)
            elif isinstance(l, MaxPoolLayer):
                y = torch_maxpool(y, l.size, l.stride)
            elif isinstance(l, RouteLayer):
                parts = []
                for a in l.layers:
                    t = outputs[a]
                    if l.groups > 1:  # CSP split (yolov4-tiny)
                        g = t.shape[1] // l.groups
                        t = t[:, l.group_id * g:(l.group_id + 1) * g]
                    parts.append(t)
                y = torch.cat(parts, dim=1)
            elif isinstance(l, ReorgLayer):
                y = torch_reorg(y, l.stride)
            elif isinstance(l, ShortcutLayer):
                y = y + outputs[l.from_layer]
                if l.activation == "leaky":
                    y = F.leaky_relu(y, 0.1)
                elif l.activation != "linear":
                    raise ValueError(l.activation)
            elif isinstance(l, UpsampleLayer):
                y = F.interpolate(y, scale_factor=l.stride, mode="nearest")
            elif isinstance(l, YoloLayer):
                heads.append(y.numpy())
            elif isinstance(l, RegionLayer):
                pass
            outputs.append(y)
        if heads:
            return heads
        return y.numpy()
