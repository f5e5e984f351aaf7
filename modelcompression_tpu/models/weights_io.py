"""Darknet ``.weights`` binary codec (SURVEY.md Appendix A.2).

Layout (public Darknet format — required for interchange with the reference's
pretrained models; the "bit-matching mAP on the unpruned model" contract,
BASELINE.json:5, presupposes loading the same weight file):

* Header: int32 major, int32 minor, int32 revision, then ``seen``
  (images-seen counter) as int64 if ``major*10+minor >= 2`` else int32.
* Then, for each [convolutional] layer in network order:
    - if batch_normalize: beta (bn bias), gamma (bn scale), rolling_mean,
      rolling_var — each float32[out_ch]
    - else: bias float32[out_ch]
    - conv weights float32[out_ch * in_ch * kh * kw], OIHW row-major.

Our in-memory layout is HWIO (TPU-native, see darknet.py); this codec is the
only place the OIHW<->HWIO transpose happens.
"""

from __future__ import annotations

import io
from typing import BinaryIO, Tuple

import numpy as np

from modelcompression_tpu.models.cfg import ConvLayer, NetworkSpec
from modelcompression_tpu.models.darknet import Params, conv_key


def _seen_dtype(major: int, minor: int):
    """Darknet parser.c: seen is int64 iff (major*10+minor) >= 2 AND both
    major/minor < 1000 (>=1000 marks the ancient transposed format, which
    keeps a 4-byte seen)."""
    if major < 1000 and minor < 1000 and (major * 10 + minor) >= 2:
        return np.int64
    return np.int32


def load_weights(path_or_file, spec: NetworkSpec,
                 partial: bool = False) -> Tuple[Params, int]:
    """Read a Darknet .weights file into a params pytree for ``spec``.

    Returns (params, seen). Raises if the file is too short / too long for
    the architecture — a truncated read silently producing a wrong model is
    the classic failure mode of this format.

    ``partial=True`` accepts a backbone-prefix file (Darknet's
    ``darknet19.conv.23`` convention, produced by ``darknet partial`` /
    ``save_weights(n_convs=...)``): reading stops cleanly at the first conv
    whose tensors are not fully present, and ``params`` contains only the
    loaded prefix — the caller fills the rest (see cli/common.load_model).
    A file that ends MID-layer still raises.
    """
    if hasattr(path_or_file, "read"):
        buf = path_or_file.read()
    else:
        with open(path_or_file, "rb") as f:
            buf = f.read()

    header = np.frombuffer(buf[:12], dtype=np.int32)
    major, minor, _revision = (int(v) for v in header)
    sdt = _seen_dtype(major, minor)
    off = 12 + np.dtype(sdt).itemsize
    seen = int(np.frombuffer(buf[12:off], dtype=sdt)[0])

    data = np.frombuffer(buf[off:], dtype=np.float32)
    pos = 0

    def take(n: int) -> np.ndarray:
        nonlocal pos
        if pos + n > data.size:
            raise ValueError(
                f".weights file truncated: need {n} floats at offset {pos}, "
                f"have {data.size - pos}")
        out = data[pos:pos + n]
        pos += n
        return out

    params: Params = {}
    for i, l in enumerate(spec.layers):
        if not isinstance(l, ConvLayer):
            continue
        oc, ic, k = l.filters, l.in_channels, l.size
        n_layer = (4 * oc if l.batch_normalize else oc) + oc * ic * k * k
        if partial and pos + n_layer > data.size:
            if pos == data.size:
                break  # clean prefix boundary
            raise ValueError(
                f".weights file ends MID-layer at conv {i}: need {n_layer} "
                f"floats, have {data.size - pos} — not a valid partial file")
        p = {}
        if l.batch_normalize:
            p["beta"] = take(oc).copy()
            p["gamma"] = take(oc).copy()
            p["mean"] = take(oc).copy()
            p["var"] = take(oc).copy()
        else:
            p["bias"] = take(oc).copy()
        w = take(oc * ic * k * k).reshape(oc, ic, k, k)  # OIHW
        p["w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # -> HWIO
        params[conv_key(i)] = p

    if pos != data.size:
        raise ValueError(
            f".weights file has {data.size - pos} trailing floats — "
            "architecture mismatch")
    return params, seen


def save_weights(path_or_file, spec: NetworkSpec, params: Params,
                 seen: int = 0, major: int = 0, minor: int = 2,
                 revision: int = 0, n_convs: int | None = None) -> None:
    """Write params as a Darknet .weights file (inverse of load_weights).

    ``n_convs``: write only the first N conv layers — Darknet's
    ``partial`` command, producing backbone files like darknet19.conv.23
    for transfer-learning initialization."""
    out: BinaryIO
    own = False
    if hasattr(path_or_file, "write"):
        out = path_or_file
    else:
        out = open(path_or_file, "wb")
        own = True
    written = 0
    try:
        out.write(np.array([major, minor, revision], np.int32).tobytes())
        out.write(np.array([seen], _seen_dtype(major, minor)).tobytes())
        for i, l in enumerate(spec.layers):
            if not isinstance(l, ConvLayer):
                continue
            if n_convs is not None and written >= n_convs:
                break
            written += 1
            p = params[conv_key(i)]
            if l.batch_normalize:
                for key in ("beta", "gamma", "mean", "var"):
                    out.write(np.asarray(p[key], np.float32).tobytes())
            else:
                out.write(np.asarray(p["bias"], np.float32).tobytes())
            w = np.asarray(p["w"], dtype=np.float32)  # HWIO
            out.write(w.transpose(3, 2, 0, 1).tobytes())  # OIHW
    finally:
        if own:
            out.close()


def roundtrip_bytes(spec: NetworkSpec, params: Params, seen: int = 0) -> bytes:
    b = io.BytesIO()
    save_weights(b, spec, params, seen=seen)
    return b.getvalue()
