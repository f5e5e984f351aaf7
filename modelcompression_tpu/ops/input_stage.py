"""Fused input stage: conv1(3x3, stride 1, pad 1, C_in=3) + bias + leaky
+ maxpool(2x2, stride 2) as ONE matmul-shaped op.

Why (docs/PERF.md "Where the unpruned MFU goes"): conv1 carries 1% of
YOLOv2's FLOPs but 24% of its forward time — 3 input channels use 27 of
the MXU's 128 lanes, and XLA materializes the 708 MB conv1 output to HBM
twice (write, then pool read). This module reformulates the stage on the
space-to-depth grid so that

  * the matmul contracts K = 3x3 taps x 12 s2d channels = 108 lanes
    (84% MXU lane utilization instead of 21%), and
  * all FOUR maxpool phases come out of one matmul as 4*C_out output
    columns, so pooling is a cheap max over the channel dim and the
    416^2-resolution conv output is never materialized.

Exactness: maxpool(leaky(conv(x) + b)) == leaky(max_phases(matmul) + b)
because leaky is monotone increasing and b is constant per channel; the
phase matmul taps are an exact rearrangement of the conv taps (tested
against the plain conv+pool in tests/test_input_stage.py; the same
identity was validated on hardware by tools/experiment_s2d.py).

Two implementations with identical signatures:
  * ``fused_conv1_pool_xla`` — pure-jnp twin (im2col in HBM); the
    reference for tests and the CPU fallback.
  * ``fused_conv1_pool_pallas`` — the TPU kernel: builds the 108-lane
    patches in VMEM (never materializing im2col in HBM) and fuses
    matmul + phase-max + bias + leaky in one pass.

STATUS (measured 2026-08-16, docs/PERF.md "input stage"): the
reformulation is exact and fully tested, but NOT production-enabled —
on the current toolchain XLA's plain conv+pool (4.70 ms unpruned) beats
every expressible variant: the XLA s2d-conv form reads 12.24 ms (XLA
pads the 12-channel input instead of im2col-ing), the XLA im2col twin
31 ms (597 MB patch materialization), and the Pallas kernel cannot run
efficiently because pallas's HBM view lane-pads a 12-channel minor dim
to 128 (a 10.7x materializing copy before the kernel), while lane-split
reshapes/concats inside the kernel are unsupported by Mosaic. Kept as
infrastructure + tests for a future toolchain; everything defaults OFF.

Reference provenance: the reference's conv/pool are framework calls
(SURVEY.md §2.2 — it has no native kernels); this belongs to the build's
native tier mandated by BASELINE.json:5 (on-device kernels for the hot
path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.models.cfg import (
    ConvLayer, MaxPoolLayer, NetworkSpec, RouteLayer,
)

# pool phase (py, px) order; phase p lives in output columns [p*C, (p+1)*C)
_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))
LEAKY_SLOPE = 0.1


def input_stage_match(spec: NetworkSpec) -> bool:
    """True iff layers[0:2] are the fusable conv+pool pattern and no route
    consumes the un-pooled conv output."""
    if len(spec.layers) < 2:
        return False
    if spec.net.height % 2 or spec.net.width % 2:
        # space_to_depth2's reshape needs even H/W; decline the fusion
        # instead of failing at trace time with an opaque reshape error
        return False
    l0, l1 = spec.layers[0], spec.layers[1]
    if not (isinstance(l0, ConvLayer) and l0.size == 3 and l0.stride == 1
            and l0.padding == 1 and l0.in_channels == 3
            and l0.activation == "leaky" and 4 * l0.filters <= 128):
        return False
    if not (isinstance(l1, MaxPoolLayer) and l1.size == 2 and l1.stride == 2
            and l1.pad_total // 2 == 0):
        return False
    for l in spec.layers:
        if isinstance(l, RouteLayer) and 0 in l.layers:
            return False
    return True


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel j = (ry*2 + rx)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


@functools.lru_cache(maxsize=None)
def _tap_matrix() -> np.ndarray:
    """(108, 4, 3, 3, 3) 0/1 tensor M[k, p, ky, kx, c] mapping conv taps to
    patch lanes.

    Patch lane k = (dy*3 + dx)*12 + (ry*2 + rx)*3 + c indexes the padded-s2d
    window value s2d[y+dy-1, x+dx-1, (ry*2+rx)*3 + c]; phase p=(py, px) of
    pooled output (y, x) is the conv at original pixel (2y+py, 2x+px),
    whose tap (ky, kx, c) reads original pixel (2y+py+ky-1, 2x+px+kx-1, c)
    = s2d[(2y+py+ky-1 - ry)/2, ..., c] with ry = (py+ky+1) % 2 — each
    (p, ky, kx, c) maps to exactly one k (27 live lanes per phase).
    """
    m = np.zeros((108, 4, 3, 3, 3), np.float32)
    for p, (py, px) in enumerate(_PHASES):
        for ky in range(3):
            ry = (py + ky + 1) % 2
            dy = (py + ky - 1 - ry) // 2 + 1
            for kx in range(3):
                rx = (px + kx + 1) % 2
                dx = (px + kx - 1 - rx) // 2 + 1
                for c in range(3):
                    k = (dy * 3 + dx) * 12 + (ry * 2 + rx) * 3 + c
                    m[k, p, ky, kx, c] = 1.0
    return m


def s2d_weights(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, C) conv kernel -> (108, 4C) phase-matmul weights."""
    c_out = w_hwio.shape[3]
    m = jnp.asarray(_tap_matrix(), w_hwio.dtype)
    ws = jnp.einsum("kpyxc,yxcf->kpf", m, w_hwio)
    return ws.reshape(108, 4 * c_out)


def _pad_s2d(x: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    s = space_to_depth2(x.astype(compute_dtype))
    return jnp.pad(s, ((0, 0), (1, 1), (1, 1), (0, 0)))


def fused_conv1_pool_xla(x: jnp.ndarray, w_hwio: jnp.ndarray,
                         bias: jnp.ndarray,
                         compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Pure-jnp twin (materializes im2col patches in HBM): the numerics
    reference for the Pallas kernel and the CPU fallback.

    x: (B, H, W, 3) float, H/W even. Returns (B, H/2, W/2, C) in
    compute_dtype (matching core.precision.FAST's bf16-out convs).
    """
    b, h, w, _ = x.shape
    h2, w2 = h // 2, w // 2
    sp = _pad_s2d(x, compute_dtype)
    parts = [sp[:, dy:dy + h2, dx:dx + w2, :]
             for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(parts, axis=-1)          # (B, H2, W2, 108)
    ws = s2d_weights(w_hwio.astype(compute_dtype))     # (108, 4C)
    r = jax.lax.dot_general(
        patches, ws, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    c_out = w_hwio.shape[3]
    r = r.reshape(b, h2, w2, 4, c_out).max(axis=3)
    y = r + bias.astype(jnp.float32)
    y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    return y.astype(compute_dtype)


def _kernel(x_ref, w_ref, b_ref, out_ref, win_ref, patch_ref, sem_ref, *,
            tile_h: int, w2: int, c_out: int, out_dtype):
    """Pallas body: grid (B, H2 // tile_h).

    x_ref:   (B, H2+2, W2+2, 12) padded s2d input, stays in ANY/HBM —
             row windows (tile_h+2 halo) are DMA'd in, double-buffered.
    w_ref:   (108, 4C) VMEM.
    b_ref:   (1, C) f32 VMEM.
    out_ref: (1, tile_h, W2, C) VMEM block (pipelined by pallas).
    win_ref: (2, tile_h+2, W2+2, 12) VMEM scratch (the two DMA slots).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    n_t = pl.num_programs(1)

    def dma(slot, t):
        # t is the GLOBAL step index: image t // n_t, row-tile t % n_t
        return pltpu.make_async_copy(
            x_ref.at[t // n_t, pl.ds((t % n_t) * tile_h, tile_h + 2)],
            win_ref.at[slot],
            sem_ref.at[slot],
        )

    step = b_idx * n_t + t_idx
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    # warm-up: the very first grid step starts its own DMA
    @pl.when(step == 0)
    def _():
        dma(slot, step).start()

    # prefetch the next window while this one computes
    @pl.when(step + 1 < pl.num_programs(0) * n_t)
    def _():
        dma(nxt, step + 1).start()

    dma(slot, step).wait()

    # assemble patches via explicit scratch stores: Mosaic's concatenate
    # rejects parts whose dx shifts leave different sublane offsets
    # ("offset mismatch on non-concat dimension"); stores relayout
    for t in range(9):
        dy, dx = t // 3, t % 3
        patch_ref[:, :, t * 12:(t + 1) * 12] = \
            win_ref[slot, dy:dy + tile_h, dx:dx + w2, :]
    flat = patch_ref[:].reshape(tile_h * w2, 108)
    acc = jnp.dot(flat, w_ref[:], preferred_element_type=jnp.float32)
    # phase max via static lane slices — Mosaic cannot reshape-split the
    # lane dim ((N, 4C) -> (..., 4, C) fails with "unsupported shape cast")
    c = c_out
    r = jnp.maximum(jnp.maximum(acc[:, 0:c], acc[:, c:2 * c]),
                    jnp.maximum(acc[:, 2 * c:3 * c], acc[:, 3 * c:4 * c]))
    y = r + b_ref[0]
    y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    out_ref[0] = y.reshape(tile_h, w2, c_out).astype(out_dtype)


def fused_conv1_pool_pallas(x: jnp.ndarray, w_hwio: jnp.ndarray,
                            bias: jnp.ndarray,
                            compute_dtype=jnp.bfloat16,
                            tile_h: int = 16,
                            interpret: bool = False) -> jnp.ndarray:
    """TPU kernel version of ``fused_conv1_pool_xla`` (same signature and
    numerics class; never materializes patches in HBM)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = x.shape
    h2, w2 = h // 2, w // 2
    if h2 % tile_h:
        # fall back rather than handle ragged tails (416-family nets are
        # all multiples of 32, so this only triggers on exotic sizes)
        return fused_conv1_pool_xla(x, w_hwio, bias, compute_dtype)
    c_out = w_hwio.shape[3]
    sp = _pad_s2d(x, compute_dtype)                    # (B, H2+2, W2+2, 12)
    # Mosaic DMA slices must be 8-aligned on the sublane (W) dim: pad the
    # stored width up to a multiple of 8 so whole-width windows qualify
    wp = -(-(w2 + 2) // 8) * 8
    if wp != w2 + 2:
        sp = jnp.pad(sp, ((0, 0), (0, 0), (0, wp - (w2 + 2)), (0, 0)))
    ws = s2d_weights(w_hwio.astype(compute_dtype))     # (108, 4C)
    b2d = bias.astype(jnp.float32).reshape(1, c_out)

    n_t = h2 // tile_h
    kernel = functools.partial(
        _kernel, tile_h=tile_h, w2=w2, c_out=c_out, out_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # x: manual DMA
            pl.BlockSpec((108, 4 * c_out), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w2, c_out),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, c_out), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wp, 12), compute_dtype),
            pltpu.VMEM((tile_h, w2, 108), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sp, ws, b2d)


def fused_conv1_pool(x: jnp.ndarray, w_hwio: jnp.ndarray, bias: jnp.ndarray,
                     compute_dtype=jnp.bfloat16,
                     use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Dispatcher. Default: the jnp twin everywhere — the Pallas kernel
    currently trips Mosaic layout limits on hardware (12-lane minor dims
    are padded 128-wide in pallas's HBM view, forcing a 10.7x
    materializing copy; docs/PERF.md "input stage"). Pass
    ``use_pallas=True`` only for interpret-mode testing or a future
    toolchain."""
    if use_pallas:
        return fused_conv1_pool_pallas(x, w_hwio, bias, compute_dtype)
    return fused_conv1_pool_xla(x, w_hwio, bias, compute_dtype)
