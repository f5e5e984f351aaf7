"""Native-performance kernel tier (SURVEY.md §2.2): Pallas TPU kernels with
pure-XLA equivalents for every op.

* topk_mask — segmented bit-bisection magnitude thresholding (one XLA
  program for the whole network; no per-layer-shape compiles). The
  PRODUCTION default for magnitude/global pruning (compress/backend.py).
* pallas_topk — the fused Pallas twin: hand-written count and mask+apply
  kernels, tie-stable, drop-in signatures.
* input_stage — fused conv1+pool phase-matmul reformulation: exact and
  tested, but measured SLOWER than XLA's conv+pool on this toolchain, so
  parked behind EvalConfig.fuse_input_stage (docs/PERF.md).

NMS is deliberately NOT Pallas: the production NMS is XLA top-k + one
(K,K) IoU matrix + a K-step scan (evaluation/nms.py), measured <1 ms at
the bench shape — a kernel would add nothing (docs/PERF.md).
"""

from modelcompression_tpu.ops.topk_mask import (
    abs_bits, magnitude_masks, magnitude_masks_global,
    magnitude_masks_perlayer, segmented_kth_bits, segmented_rank_mask,
)
from modelcompression_tpu.ops.pallas_topk import (
    pallas_magnitude_masks, pallas_magnitude_masks_global,
    pallas_magnitude_masks_perlayer, pallas_magnitude_prune,
    pallas_prune_flat,
)

__all__ = [
    "abs_bits", "magnitude_masks", "magnitude_masks_global",
    "magnitude_masks_perlayer", "segmented_kth_bits", "segmented_rank_mask",
    "pallas_magnitude_masks", "pallas_magnitude_masks_global",
    "pallas_magnitude_masks_perlayer", "pallas_magnitude_prune",
    "pallas_prune_flat",
]
