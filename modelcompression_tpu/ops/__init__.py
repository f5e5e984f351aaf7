"""Native-performance kernel tier (SURVEY.md §2.2): Pallas TPU kernels with
pure-XLA equivalents for every op.

* topk_mask — segmented bit-bisection magnitude thresholding (one XLA
  program for the whole network; no per-layer-shape compiles).
* pallas_topk — the fused Pallas twin: hand-written count and mask+apply
  kernels, tie-stable, drop-in signatures.
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
