"""Gradual magnitude pruning (GMP) — sparsify DURING training, inside the
one jitted train step (Zhu & Gupta 2017, "To prune, or not to prune").

The reference's workflow is prune-then-fine-tune (SURVEY.md §3.2/§3.4);
GMP is the in-training alternative: sparsity ramps from ``initial`` to
``final`` along a cubic schedule, and the keep-masks are recomputed from
the live weight magnitudes every ``frequency`` steps. TPU-native design:

* The mask recompute runs ON DEVICE inside the train step — the segmented
  bisection (ops/topk_mask.py) accepts a *traced* per-segment zero count,
  so the schedule's step-dependent sparsity adds zero extra XLA programs
  and zero host round-trips (BASELINE.json:5's core demand, extended from
  mask re-APPLY to mask re-COMPUTE).
* ``lax.cond`` gates the recompute: off-schedule steps pay one predicated
  branch, not a bisection.
* Masked weights get exactly-zero gradients (w_eff = w * mask in the loss)
  and are re-zeroed after the optimizer update, so their magnitude stays
  0 and the schedule is monotone in practice — matching the TF
  model_pruning library's behavior.

One rounding caveat: the zero count is ``floor(sparsity * n)`` computed in
float32 on device, where the post-hoc prune paths use Python-float
``int(sparsity * n)``. For dyadic sparsities (0.5, 0.75, ...) the two are
bit-identical (property-tested); for non-dyadic values they may differ by
one weight per layer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from modelcompression_tpu.models.cfg import NetworkSpec
from modelcompression_tpu.models.darknet import Params
from modelcompression_tpu.ops.topk_mask import (
    _concat_layout, _prunable_keys, abs_bits, segmented_rank_mask,
)


@dataclasses.dataclass(frozen=True)
class GMPSpec:
    """Schedule for gradual magnitude pruning inside the train step.

    Sparsity at step t (cubic ramp, Zhu & Gupta 2017 eq. 1):

        s(t) = final + (initial - final) * (1 - clip((t-begin)/(end-begin),
                                                     0, 1))**3

    Masks are recomputed at every step t with begin <= t <= end and
    (t - begin) % frequency == 0, plus at t == end exactly (so the run
    always finishes at ``final`` even when end-begin is not a multiple of
    frequency). ``skip`` lists conv layer indices exempt from pruning.
    """

    final_sparsity: float
    initial_sparsity: float = 0.0
    begin: int = 0
    end: int = 1
    frequency: int = 100
    per_layer: bool = True
    skip: Sequence[int] = ()

    def __post_init__(self):
        if not 0.0 <= self.initial_sparsity < 1.0:
            raise ValueError(
                f"initial_sparsity must be in [0, 1), got "
                f"{self.initial_sparsity}")
        if not self.initial_sparsity <= self.final_sparsity < 1.0:
            raise ValueError(
                f"final_sparsity must be in [initial_sparsity, 1), got "
                f"{self.final_sparsity}")
        if self.end <= self.begin:
            raise ValueError(
                f"end ({self.end}) must be > begin ({self.begin})")
        if self.frequency < 1:
            raise ValueError(f"frequency must be >= 1, got {self.frequency}")


def gmp_sparsity(step: jnp.ndarray, spec: GMPSpec) -> jnp.ndarray:
    """s(t) on the cubic ramp — jittable in the step counter."""
    frac = jnp.clip(
        (jnp.asarray(step, jnp.float32) - spec.begin)
        / (spec.end - spec.begin), 0.0, 1.0)
    return jnp.asarray(
        spec.final_sparsity
        + (spec.initial_sparsity - spec.final_sparsity) * (1.0 - frac) ** 3,
        jnp.float32)


def gmp_masks(params: Params, net: NetworkSpec, sparsity,
              per_layer: bool = True,
              skip: Sequence[int] = ()) -> Dict[str, jnp.ndarray]:
    """Magnitude keep-masks at a possibly-TRACED sparsity — the traced twin
    of ops.topk_mask.magnitude_masks (same bisection, same tie-stable
    semantics; zero count floor'd in float32, see module docstring)."""
    keys = _prunable_keys(net, skip)
    cat, sizes, seg_bounds = _concat_layout(params, keys)
    bits = abs_bits(cat)
    s = jnp.asarray(sparsity, jnp.float32)
    if per_layer:
        n_segments = len(keys)
        seg_ids = jnp.concatenate([
            jnp.full((n,), i, jnp.int32) for i, n in enumerate(sizes)])
        n_zero = jnp.floor(
            s * jnp.asarray(sizes, jnp.float32)).astype(jnp.int32)
    else:
        n_segments = 1
        seg_ids = jnp.zeros((cat.size,), jnp.int32)
        n_zero = jnp.floor(s * cat.size).reshape(1).astype(jnp.int32)
    mask_flat = segmented_rank_mask(bits, seg_ids, n_zero, n_segments)
    return {k: mask_flat[off:off + n].reshape(params[k]["w"].shape)
            for k, (off, n) in zip(keys, seg_bounds)}


def gmp_init_masks(params: Params, net: NetworkSpec,
                   spec: GMPSpec) -> Dict[str, jnp.ndarray]:
    """All-keep boolean masks for every GMP-managed conv — the TrainState
    seed (the step's lax.cond needs a structurally-stable mask pytree
    from step 0)."""
    return {k: jnp.ones(params[k]["w"].shape, bool)
            for k in _prunable_keys(net, spec.skip)}


def gmp_mask_update(spec: GMPSpec, net: NetworkSpec, trainable: Params,
                    masks: Dict[str, jnp.ndarray],
                    step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """One scheduled mask update, jit-safe: recompute the GMP-managed
    masks from the live weights when the schedule says so, else pass the
    old masks through (lax.cond — the bisection only executes on due
    steps). Non-GMP masks in ``masks`` (if any) pass through untouched.

    MONOTONE by construction: the recomputed keep set is intersected with
    the old one, so a once-pruned weight never re-enters. Without the
    intersection there is a tie window: pruned weights sit at exactly 0,
    and if a surviving weight also reaches exactly 0 (weight decay can do
    this), the stable-by-index tie break at the next equal-sparsity
    recompute could prune the survivor and *re-admit* the earlier-pruned
    weight (harmlessly zero-valued, but then live to gradients again).
    The intersection closes that window; since the ramp is monotone
    nondecreasing, it can only add zeros beyond ``floor(s(t)*n)`` in
    those exact-tie cases (pinned by tests/test_gmp.py)."""
    keys = _prunable_keys(net, spec.skip)
    missing = [k for k in keys if k not in masks]
    if missing:
        raise ValueError(
            f"GMP needs masks for {missing} in the train state — create it "
            f"with weight_masks=gmp_init_masks(...)")
    step = jnp.asarray(step, jnp.int32)
    in_window = (step >= spec.begin) & (step <= spec.end)
    on_tick = ((step - spec.begin) % spec.frequency == 0) | (step == spec.end)
    sparsity = gmp_sparsity(step, spec)

    def recompute(_):
        fresh = gmp_masks(trainable, net, sparsity,
                          per_layer=spec.per_layer, skip=spec.skip)
        # once pruned, always pruned (docstring: closes the exact-zero
        # tie re-entry window; the ramp is monotone so old ⊇ new holds
        # everywhere except ties, where the intersection enforces it)
        return {k: fresh[k] & masks[k] for k in keys}

    def keep(_):
        return {k: masks[k] for k in keys}

    new = jax.lax.cond(in_window & on_tick, recompute, keep, None)
    out = dict(masks)
    out.update(new)
    return out
