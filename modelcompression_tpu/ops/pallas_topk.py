"""Pallas TPU kernels for fused magnitude top-k/masking (BASELINE.json:5:
"magnitude-ranking pruning ... becomes fused Pallas top-k/mask kernels").

Same algorithm as ops/topk_mask.py (segmented bisection over |w| bit
patterns + stable tie-ranking), with the two hot passes hand-written:

* ``_count_le_kernel`` — per-segment count of elements <= pivot, one VMEM
  chunk per grid step, counts accumulated in a VMEM scratch across the
  (sequential) TPU grid. Called 31x inside the bisection fori_loop — one
  compiled program total.
* ``_apply_kernel`` — the fused "top-k mask + apply" pass: reads weights
  once, writes masked weights once; the mask itself (threshold compare +
  within-chunk tie cumsum against a prefetched per-chunk tie offset) is
  computed in-register, so masking costs a single HBM round-trip instead
  of materializing bool masks (pruned fine-tune recompute path).

Everything is padded to one canonical chunk multiple, so the whole network
needs exactly two Pallas programs regardless of its layer shapes — the
per-shape-compile trap measured on the naive path (SURVEY.md §7.4.4) does
not exist here.

On non-TPU backends the kernels run in interpreter mode (tests).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modelcompression_tpu.models.cfg import NetworkSpec
from modelcompression_tpu.models.darknet import Params
from modelcompression_tpu.ops.topk_mask import _prunable_keys, abs_bits

CHUNK = 128 * 1024  # uint32 chunk -> 512KB VMEM per input buffer (the
# apply kernel's temporaries at 256K chunks hit Mosaic's 16MB scoped limit)
LANES = 128
ROWS = CHUNK // LANES  # chunks are 2-D (ROWS, 128): Mosaic-native tiling
# NOTE: padding elements are zeros isolated in their OWN segment (n_zero=0),
# which is what keeps them out of every count — not a sentinel bit pattern.


def _interpret() -> bool:
    # decide by the device that will actually execute (the shared
    # effective-platform rule; handles Device, string, and None configs)
    from modelcompression_tpu.core.mesh import effective_platform
    return effective_platform() not in ("tpu", "axon")


def _count_le_kernel(mid_ref, bits_ref, seg_ref, out_ref, acc):
    """Grid step: accumulate per-segment counts of (bits <= mid[seg]).
    SMEM stores are scalar-only on Mosaic, hence the unrolled loops."""
    step = pl.program_id(0)
    n_seg = out_ref.shape[0]

    @pl.when(step == 0)
    def _():
        for s in range(n_seg):
            acc[s] = 0

    bits = bits_ref[:]
    segs = seg_ref[:]
    for s in range(n_seg):  # static unroll; n_seg ~ #convs (small)
        mid = mid_ref[s]
        cnt = jnp.sum(((bits <= mid) & (segs == s)).astype(jnp.int32))
        acc[s] += cnt

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        for s in range(n_seg):
            out_ref[s] = acc[s]


def pallas_count_le(bits: jnp.ndarray, seg_ids: jnp.ndarray,
                    mid: jnp.ndarray, n_segments: int) -> jnp.ndarray:
    """bits/seg_ids: (N/128, 128) 2-D views of the padded flat arrays."""
    rows = bits.shape[0]
    assert rows % ROWS == 0 and bits.shape[1] == LANES
    grid = (rows // ROWS,)
    return pl.pallas_call(
        _count_le_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mid: (S,)
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_segments,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((n_segments,), jnp.int32)],
        interpret=_interpret(),
    )(mid, bits, seg_ids)


def _prefix_along(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive prefix-sum via log-step rolls (Mosaic has no cumsum
    primitive): v + roll(v,1) + roll(v,2) + ... with wrapped lanes masked."""
    n = v.shape[axis]
    shift = 1
    while shift < n:
        r = pltpu.roll(v, shift, axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
        v = v + jnp.where(idx >= shift, r, jnp.zeros_like(v))
        shift *= 2
    return v


def _cumsum_rowmajor(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of a (R, 128) block in row-major element order."""
    row = _prefix_along(x, 1)
    row_tot = jnp.sum(x, axis=1, keepdims=True)
    tot_b = jnp.broadcast_to(row_tot, x.shape)
    row_off = _prefix_along(tot_b, 0) - tot_b  # exclusive row prefix
    return row + row_off


def _apply_kernel(tau_ref, budget_ref, seg_start_ref, chunk_off_ref,
                  w_ref, bits_ref, seg_ref, out_ref):
    """Fused mask+apply: out = w * keep(bits, tau, tie ranking).

    One tie-cumsum for ALL segments (segments are contiguous in flat
    order, so a global tie rank minus the per-segment start offset is the
    per-segment rank — same trick as the XLA version). Keeps the VMEM
    temporary footprint independent of the segment count.

    tau/budget/seg_start: (S,) SMEM. chunk_off: (grid,) SMEM — ties (all
    segments) before this chunk.
    """
    n_seg = tau_ref.shape[0]
    step = pl.program_id(0)
    bits = bits_ref[:]
    segs = seg_ref[:]
    w = w_ref[:]
    # per-element tau / budget / seg_start via segment selects (cheap:
    # one compare + select per segment, no big live temporaries)
    zeros_u = jnp.zeros(bits.shape, jnp.uint32)
    zeros_i = jnp.zeros(bits.shape, jnp.int32)
    tau_b = zeros_u
    budget_b = zeros_i
    start_b = zeros_i
    for s in range(n_seg):
        in_seg = segs == s
        tau_b = jnp.where(in_seg, tau_ref[s], tau_b)
        budget_b = jnp.where(in_seg, budget_ref[s], budget_b)
        start_b = jnp.where(in_seg, seg_start_ref[s], start_b)
    at = bits == tau_b
    rank = (_cumsum_rowmajor(at.astype(jnp.int32))
            + chunk_off_ref[step] - start_b)
    zero = (bits < tau_b) | (at & (rank <= budget_b))
    out_ref[:] = jnp.where(zero, 0.0, w)


def pallas_apply_threshold(w_cat: jnp.ndarray, bits: jnp.ndarray,
                           seg_ids: jnp.ndarray, tau: jnp.ndarray,
                           tie_budget: jnp.ndarray,
                           seg_tie_start: jnp.ndarray,
                           chunk_tie_off: jnp.ndarray) -> jnp.ndarray:
    """All big arrays are (N/128, 128)."""
    rows = w_cat.shape[0]
    grid = (rows // ROWS,)
    return pl.pallas_call(
        _apply_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tau (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # budget (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seg_tie_start (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_tie_off (grid,)
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), w_cat.dtype),
        interpret=_interpret(),
    )(tau, tie_budget, seg_tie_start, chunk_tie_off, w_cat, bits, seg_ids)


def _tie_count_kernel(tau_ref, bits_ref, seg_ref, out_ref):
    """Per-chunk per-segment tie counts (for the exclusive-scan offsets).
    out_ref is the full (n_chunks, S) SMEM array (blocked SMEM outputs are
    not lowerable); each grid step writes its own row."""
    step = pl.program_id(0)
    n_seg = tau_ref.shape[0]
    bits = bits_ref[:]
    segs = seg_ref[:]
    for s in range(n_seg):
        out_ref[step, s] = jnp.sum(
            ((bits == tau_ref[s]) & (segs == s)).astype(jnp.int32))


def pallas_tie_counts(bits: jnp.ndarray, seg_ids: jnp.ndarray,
                      tau: jnp.ndarray, n_segments: int) -> jnp.ndarray:
    rows = bits.shape[0]
    grid = (rows // ROWS,)
    return pl.pallas_call(
        _tie_count_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((rows // ROWS, n_segments),
                                       jnp.int32),
        interpret=_interpret(),
    )(tau, bits, seg_ids)


@functools.partial(jax.jit, static_argnames=("n_segments",))
def _pallas_kth_bits(bits, seg_ids, k, n_segments):
    def body(_, lohi):
        lo, hi = lohi
        mid = lo + ((hi - lo) >> jnp.uint32(1))
        cnt = pallas_count_le(bits, seg_ids, mid, n_segments)
        gt = cnt > k
        return jnp.where(gt, lo, mid + jnp.uint32(1)), \
            jnp.where(gt, mid, hi)

    lo0 = jnp.zeros((n_segments,), jnp.uint32)
    hi0 = jnp.full((n_segments,), 0x7FFFFFFF, jnp.uint32)
    lo, _ = jax.lax.fori_loop(0, 31, body, (lo0, hi0))
    return lo


@functools.partial(jax.jit, static_argnames=("n_segments", "return_mask"))
def pallas_prune_flat(w_cat: jnp.ndarray, seg_ids: jnp.ndarray,
                      n_zero: jnp.ndarray, n_segments: int,
                      return_mask: bool = False) -> jnp.ndarray:
    """Fused prune of a padded concatenated weight vector: returns w with
    the per-segment n_zero smallest |w| zeroed (tie-stable). Semantics match
    ops.topk_mask exactly.

    With ``return_mask=True`` the same keep/zero decision is applied to a
    ones-vector instead of the weights, yielding the keep mask directly
    from the rank rule (so already-zero weights count as pruned exactly
    like criteria.py ranks them — smallest first)."""
    flat_n = w_cat.shape[0]
    w_cat = w_cat.reshape(-1, LANES)
    seg_ids = seg_ids.reshape(-1, LANES)
    bits = abs_bits(w_cat)
    nz = jnp.maximum(n_zero, 0)
    kth = _pallas_kth_bits(bits, seg_ids, jnp.maximum(nz - 1, 0),
                           n_segments)
    # disable zeroing entirely for segments with n_zero == 0 by an
    # impossible threshold (0) and zero budget
    tau = jnp.where(nz > 0, kth, jnp.uint32(0))
    # n_below must be count(bits < tau). The kernel counts <=, so we count
    # <= tau-1 — EXCEPT when tau == 0 (k-th smallest |w| is exactly 0.0,
    # e.g. re-pruning already-pruned weights): nothing is < 0, so n_below
    # is literally 0 there. Counting <= 0 instead would eat the whole tie
    # budget with the zeros themselves and prune nothing.
    n_below = pallas_count_le(
        bits, seg_ids, jnp.where(tau > 0, tau - jnp.uint32(1),
                                 jnp.uint32(0)), n_segments)
    n_below = jnp.where((nz > 0) & (tau > jnp.uint32(0)), n_below, 0)
    budget = jnp.where(nz > 0, nz - n_below, 0)
    per_chunk = pallas_tie_counts(bits, seg_ids, tau, n_segments)  # (G, S)
    # ties-before-this-chunk (all segments) and ties-before-this-segment
    chunk_tot = jnp.sum(per_chunk, axis=1)
    chunk_tie_off = jnp.cumsum(chunk_tot) - chunk_tot
    seg_tot = jnp.sum(per_chunk, axis=0)
    seg_tie_start = jnp.cumsum(seg_tot) - seg_tot
    src = jnp.ones_like(w_cat) if return_mask else w_cat
    out = pallas_apply_threshold(
        src, bits, seg_ids, tau, budget,
        seg_tie_start.astype(jnp.int32), chunk_tie_off.astype(jnp.int32))
    return out.reshape(flat_n)


def _layout(params: Params, keys: List[str]):
    if not keys:
        raise ValueError("nothing to prune: every conv layer is skipped")
    flats = [params[k]["w"].reshape(-1) for k in keys]
    sizes = [int(f.size) for f in flats]
    total = sum(sizes)
    padded = ((total + CHUNK - 1) // CHUNK) * CHUNK
    cat = jnp.concatenate(
        flats + [jnp.zeros((padded - total,), flats[0].dtype)])
    return cat, sizes, total, padded


def _seg_ids_for(sizes, padded, per_layer: bool, n_pad_segment: int):
    if per_layer:
        ids = np.concatenate(
            [np.full(s, i, np.int32) for i, s in enumerate(sizes)]
            + [np.full(padded - sum(sizes), n_pad_segment, np.int32)])
    else:
        ids = np.concatenate(
            [np.zeros(sum(sizes), np.int32),
             np.full(padded - sum(sizes), n_pad_segment, np.int32)])
    return jnp.asarray(ids)


def _prune_layout(params: Params, spec: NetworkSpec, sparsity: float,
                  per_layer: bool, skip: Sequence[int]):
    keys = _prunable_keys(spec, skip)
    cat, sizes, total, padded = _layout(params, keys)
    n_real_segments = len(keys) if per_layer else 1
    n_segments = n_real_segments + 1  # + padding segment
    seg_ids = _seg_ids_for(sizes, padded, per_layer, n_real_segments)
    if per_layer:
        n_zero = jnp.asarray([int(sparsity * s) for s in sizes] + [0],
                             jnp.int32)
    else:
        n_zero = jnp.asarray([int(sparsity * total), 0], jnp.int32)
    return keys, cat, sizes, seg_ids, n_zero, n_segments


def pallas_magnitude_prune(params: Params, spec: NetworkSpec,
                           sparsity: float, per_layer: bool = True,
                           skip: Sequence[int] = ()) -> Params:
    """Prune weights in place (returns new params with zeros applied) using
    the fused Pallas path. The padding tail is its own segment with
    n_zero=0, so it never interacts with real weights."""
    keys, cat, sizes, seg_ids, n_zero, n_segments = _prune_layout(
        params, spec, sparsity, per_layer, skip)
    pruned_flat = pallas_prune_flat(cat, seg_ids, n_zero, n_segments)
    out = dict(params)
    off = 0
    for k, s in zip(keys, sizes):
        out[k] = dict(params[k],
                      w=pruned_flat[off:off + s].reshape(
                          params[k]["w"].shape))
        off += s
    return out


def pallas_magnitude_masks(params: Params, spec: NetworkSpec,
                           sparsity: float, per_layer: bool = True,
                           skip: Sequence[int] = ()
                           ) -> Dict[str, jnp.ndarray]:
    """Mask-producing wrapper (drop-in for compress.criteria signatures):
    the fused kernel's keep/zero rank decision applied to a ones-vector, so
    the mask comes straight from the rank rule — already-zero weights rank
    smallest and are pruned first, exactly like criteria.magnitude_masks_*
    (re-running prune at a higher sparsity therefore reports true achieved
    sparsity)."""
    keys, cat, sizes, seg_ids, n_zero, n_segments = _prune_layout(
        params, spec, sparsity, per_layer, skip)
    mask_flat = pallas_prune_flat(cat, seg_ids, n_zero, n_segments,
                                  return_mask=True)
    masks = {}
    off = 0
    for k, s in zip(keys, sizes):
        masks[k] = mask_flat[off:off + s].reshape(
            params[k]["w"].shape) != 0
        off += s
    return masks


def pallas_magnitude_masks_perlayer(params, spec, sparsity, skip=()):
    return pallas_magnitude_masks(params, spec, sparsity, per_layer=True,
                                  skip=skip)


def pallas_magnitude_masks_global(params, spec, sparsity, skip=()):
    return pallas_magnitude_masks(params, spec, sparsity, per_layer=False,
                                  skip=skip)
