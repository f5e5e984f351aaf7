"""Precision policy: bit-match (fp32/HIGHEST) vs fast (bf16/MXU-native).

TPU matmul/conv units natively accumulate bf16 inputs; fp32 "HIGHEST" runs the
MXU in multi-pass mode for IEEE-faithful results. The reference project is
CPU fp32 throughout (SURVEY.md §1.1), and BASELINE.json:5 demands
"bit-matching mAP on the unpruned model" — which requires an explicit
fp32/HIGHEST mode here (SURVEY.md §7.4.3). The fast path (bf16 inputs, fp32
accumulation) is the performance mode for training and the batch-64 streaming
inference config (BASELINE.json:11).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    """Numeric policy threaded through model forward/backward.

    Attributes:
      compute_dtype: dtype activations/weights are cast to before convs.
      param_dtype:   dtype parameters are stored in (always fp32 here; masters
                     stay fp32 even when compute is bf16).
      conv_precision: lax precision for conv/matmul ops. HIGHEST gives
                     IEEE-faithful fp32 on the MXU (needed for bit-matching);
                     DEFAULT lets the MXU run natively.
      accum_dtype:   preferred_element_type for convs (accumulator).
    """

    name: str
    compute_dtype: jnp.dtype
    param_dtype: jnp.dtype
    conv_precision: jax.lax.Precision
    accum_dtype: jnp.dtype

    def cast_in(self, x):
        return x.astype(self.compute_dtype)

    def cast_out(self, x):
        # Keep activations in compute dtype between layers; final outputs are
        # cast to fp32 by the caller where numerics matter (decode, loss).
        return x


BITMATCH = Precision(
    name="bitmatch",
    compute_dtype=jnp.float32,
    param_dtype=jnp.float32,
    conv_precision=jax.lax.Precision.HIGHEST,
    accum_dtype=jnp.float32,
)

FAST = Precision(
    name="fast",
    compute_dtype=jnp.bfloat16,
    param_dtype=jnp.float32,
    conv_precision=jax.lax.Precision.DEFAULT,
    # bf16 in -> bf16 out: the MXU still accumulates fp32 internally, and a
    # uniform dtype keeps conv VJPs well-typed (a bf16-in/fp32-out conv has
    # no valid transpose in jax 0.9: the cotangent arrives fp32 against
    # bf16 residuals).
    accum_dtype=jnp.bfloat16,
)


def get_precision(name: str) -> Precision:
    if name in ("bitmatch", "fp32", "highest"):
        return BITMATCH
    if name in ("fast", "bf16", "default"):
        return FAST
    raise ValueError(f"unknown precision policy {name!r}")
