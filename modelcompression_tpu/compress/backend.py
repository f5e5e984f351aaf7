"""Magnitude-mask backend selection (VERDICT r1 #1; BASELINE.json:5).

Three property-tested-equal implementations of the per-layer/global
magnitude criteria exist; this module picks between them so every caller
(prune CLI, iterative loop, sweep driver) defaults to the right one:

* ``fused`` (PRODUCTION DEFAULT) — ops/topk_mask.py: ONE XLA program for
  the whole network via segmented bit-bisection. The per-shape argsort
  path compiles one program per conv shape — measured 1097 s of compile
  vs 26 s for the fused path on this TPU's remote-compile tunnel
  (ops/topk_mask.py:5-8) — so the fused form is the north-star's actual
  mechanism ("fused top-k/mask kernels so mask recompute no longer
  round-trips", BASELINE.json:5).
* ``pallas`` — ops/pallas_topk.py: the hand-written Mosaic kernel twins
  (count / tie-count / fused mask+apply); bit-equal to ``fused``,
  re-proven on hardware every bench run (bench.py).
* ``reference`` — compress/criteria.py: the readable stable-argsort
  semantics definition. Kept as the CPU oracle the other two are tested
  against (tests/test_ops_topk.py); not a production path on TPU.
"""

from __future__ import annotations

from typing import Callable

MASK_BACKENDS = ("fused", "pallas", "reference")
DEFAULT_MASK_BACKEND = "fused"


def magnitude_mask_fn(mode: str, backend: str = DEFAULT_MASK_BACKEND
                      ) -> Callable:
    """Return the mask function ``fn(params, spec, sparsity, skip=())`` for
    a criterion ``mode`` ('magnitude' = per-layer, 'global' = one network
    threshold) and ``backend`` (module docstring). All backends share the
    signature and are rank-exact tie-stable equal."""
    if mode not in ("magnitude", "global"):
        raise ValueError(f"unknown magnitude criterion mode {mode!r} "
                         "(expected 'magnitude' or 'global')")
    per_layer = mode == "magnitude"
    if backend == "fused":
        from modelcompression_tpu.ops import topk_mask as m
        return (m.magnitude_masks_perlayer if per_layer
                else m.magnitude_masks_global)
    if backend == "pallas":
        from modelcompression_tpu.ops import pallas_topk as m
        return (m.pallas_magnitude_masks_perlayer if per_layer
                else m.pallas_magnitude_masks_global)
    if backend == "reference":
        from modelcompression_tpu.compress import criteria as m
        return (m.magnitude_masks_perlayer if per_layer
                else m.magnitude_masks_global)
    raise ValueError(f"unknown mask backend {backend!r} "
                     f"(expected one of {MASK_BACKENDS})")
