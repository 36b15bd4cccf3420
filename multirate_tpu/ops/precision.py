"""Matmul precision policy for TPU contractions.

The TPU MXU's DEFAULT precision truncates float32 operands to bfloat16
(~2^-9 relative error per product) — far outside the 1e-4 RMS accuracy
budget (BASELINE.md), and fatal for one-hot select matmuls, which must
reproduce the gathered values (near-)exactly. Verified empirically on
v5e: exp/exp1_gather.py test C shows plain ``jnp.dot(onehot, x)``
returning bf16-rounded values.

- ``TAP`` (Precision.HIGH = bf16_3x): ~2^-16 relative error on
  tap-times-signal contractions — comfortably inside the budget at half
  the MXU passes of HIGHEST. bench.py validates the end-to-end RMS
  against a float64 host oracle.
- ``SELECT`` (Precision.HIGHEST): one-hot selects; six bf16 passes
  reconstruct the full f32 mantissa, so gathered values are exact.

Inside Pallas kernels Mosaic only lowers DEFAULT and HIGHEST (HIGH raises
NotImplementedError), so every in-kernel dot uses HIGHEST directly.
CPU/interpret-mode execution ignores these (always full precision).
"""

import jax

TAP = jax.lax.Precision.HIGH
SELECT = jax.lax.Precision.HIGHEST
