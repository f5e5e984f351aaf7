"""Fused on-device magnitude thresholding — one XLA program for the WHOLE
network (BASELINE.json:5: mask recompute must not round-trip to host).

Why not per-layer sorts: the naive criteria (compress/criteria.py) compile
one argsort program per conv shape — measured 1097s of compile for YOLOv2's
23 layers on this TPU's remote-compile path (vs 0.5s steady-state). This
module instead runs a **segmented bisection on the uint32 bit patterns of
|w|** over the concatenation of all layers:

* |w| >= 0, and IEEE-754 non-negative floats compare like their unsigned
  bit patterns — so bisecting 32 integer bits finds the exact k-th smallest
  value in 32 masked-count passes, with no sort and no data-dependent
  shapes.
* Per-layer and global modes are the same program: per-layer assigns each
  element a segment id (one per conv) and bisects all segments in parallel;
  global uses a single segment.
* Ties at the threshold are broken by lowest-index-first via a cumsum rank,
  matching compress/criteria.py's stable-argsort semantics bit-for-bit
  (property-tested equal).

The Pallas twin (ops/pallas_topk.py) fuses the count passes and the final
mask-apply into hand-written kernels with the same signatures.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from modelcompression_tpu.models.cfg import ConvLayer, NetworkSpec
from modelcompression_tpu.models.darknet import Params, conv_key


def _prunable_keys(spec: NetworkSpec, skip: Sequence[int]) -> List[str]:
    return [conv_key(i) for i, l in enumerate(spec.layers)
            if isinstance(l, ConvLayer) and i not in skip]


def abs_bits(w: jnp.ndarray) -> jnp.ndarray:
    """|w| as monotonically-ordered uint32 (sign bit cleared)."""
    return jax.lax.bitcast_convert_type(w.astype(jnp.float32),
                                        jnp.uint32) & jnp.uint32(0x7FFFFFFF)


@functools.partial(jax.jit, static_argnames=("n_segments",))
def segmented_kth_bits(bits: jnp.ndarray, seg_ids: jnp.ndarray,
                       k: jnp.ndarray, n_segments: int) -> jnp.ndarray:
    """For each segment s, the bit pattern of the k[s]-th smallest element
    (0-indexed; k[s] in [0, segment size)). One fori_loop of 31 masked
    segment-count passes — a single XLA program for any layer mix.
    """
    def body(i, lohi):
        lo, hi = lohi  # (S,) uint32 inclusive bounds on the answer
        mid = lo + ((hi - lo) >> jnp.uint32(1))
        below = (bits <= mid[seg_ids]).astype(jnp.int32)
        cnt = jax.ops.segment_sum(below, seg_ids, num_segments=n_segments)
        # if count(<= mid) > k, answer <= mid else answer > mid
        gt = cnt > k
        hi = jnp.where(gt, mid, hi)
        lo = jnp.where(gt, lo, mid + jnp.uint32(1))
        return lo, hi

    lo0 = jnp.zeros((n_segments,), jnp.uint32)
    hi0 = jnp.full((n_segments,), 0x7FFFFFFF, jnp.uint32)
    lo, hi = jax.lax.fori_loop(0, 31, body, (lo0, hi0))
    return lo


@functools.partial(jax.jit, static_argnames=("n_segments",))
def segmented_rank_mask(bits: jnp.ndarray, seg_ids: jnp.ndarray,
                        n_zero: jnp.ndarray, n_segments: int
                        ) -> jnp.ndarray:
    """Keep-mask: per segment, False for exactly n_zero[s] smallest elements
    (ties: lowest concat-index pruned first).

    PRECONDITION: seg_ids must be contiguous ascending blocks (segment 0's
    elements first, then segment 1's, ...) — the tie ranking is a global
    cumsum minus per-segment start offsets, which is only a per-segment
    rank under that layout. All internal callers build ids that way.
    """
    nz = jnp.maximum(n_zero, 0)
    any_zero = nz > 0
    kth = segmented_kth_bits(bits, seg_ids, jnp.maximum(nz - 1, 0),
                             n_segments)
    tau = kth[seg_ids]
    below = bits < tau
    at = bits == tau
    n_below = jax.ops.segment_sum(below.astype(jnp.int32), seg_ids,
                                  num_segments=n_segments)
    # of the ties, zero the first (n_zero - n_below) in concat order
    tie_budget = (nz - n_below)[seg_ids]
    # segmented cumulative count of ties: global cumsum minus segment offset
    at_i = at.astype(jnp.int32)
    global_cum = jnp.cumsum(at_i)  # inclusive
    seg_tie_total = jax.ops.segment_sum(at_i, seg_ids,
                                        num_segments=n_segments)
    seg_tie_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(seg_tie_total)[:-1].astype(jnp.int32)])
    tie_rank = global_cum - seg_tie_start[seg_ids]  # 1-based within segment
    zero_mask = below | (at & (tie_rank <= tie_budget))
    return ~(zero_mask & any_zero[seg_ids])


def _concat_layout(params: Params, keys: List[str]):
    if not keys:
        raise ValueError("nothing to prune: every conv layer is skipped")
    flats = [params[k]["w"].reshape(-1) for k in keys]
    sizes = [f.size for f in flats]
    cat = jnp.concatenate(flats)
    seg_bounds = []
    off = 0
    for s in sizes:
        seg_bounds.append((off, s))
        off += s
    return cat, sizes, seg_bounds


def magnitude_masks(params: Params, spec: NetworkSpec, sparsity: float,
                    per_layer: bool = True,
                    skip: Sequence[int] = ()) -> Dict[str, jnp.ndarray]:
    """Per-layer or global magnitude masks — ONE compiled program
    regardless of how many conv shapes the network has. Exactly matches
    compress.criteria.magnitude_masks_{perlayer,global}."""
    keys = _prunable_keys(spec, skip)
    cat, sizes, seg_bounds = _concat_layout(params, keys)
    bits = abs_bits(cat)
    if per_layer:
        n_segments = len(keys)
        seg_ids = jnp.concatenate([
            jnp.full((s,), i, jnp.int32) for i, s in enumerate(sizes)])
        n_zero = jnp.asarray([int(sparsity * s) for s in sizes], jnp.int32)
    else:
        n_segments = 1
        seg_ids = jnp.zeros((cat.size,), jnp.int32)
        n_zero = jnp.asarray([int(sparsity * cat.size)], jnp.int32)
    mask_flat = segmented_rank_mask(bits, seg_ids, n_zero, n_segments)
    out = {}
    for k, (off, s) in zip(keys, seg_bounds):
        out[k] = mask_flat[off:off + s].reshape(params[k]["w"].shape)
    return out


def magnitude_masks_perlayer(params: Params, spec: NetworkSpec,
                             sparsity: float, skip: Sequence[int] = ()):
    return magnitude_masks(params, spec, sparsity, per_layer=True, skip=skip)


def magnitude_masks_global(params: Params, spec: NetworkSpec,
                           sparsity: float, skip: Sequence[int] = ()):
    return magnitude_masks(params, spec, sparsity, per_layer=False,
                           skip=skip)
