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
import jax.numpy as jnp

TAP = jax.lax.Precision.HIGH
SELECT = jax.lax.Precision.HIGHEST


def split_bf16(v):
    """Exact (hi, lo) bf16 split of an f32 array, optimization-proof.

    ``hi`` is v rounded-to-nearest-even to bf16 via integer arithmetic on
    the f32 bit pattern (the classic f32->bf16 rounding: add 0x7FFF plus
    the round-to-even tiebreak bit, mask the low 16), so its bf16
    conversion is exact and lo = v - hi is exactly representable in f32
    with |lo| <= 2^-9 |v|.

    The naive round-based split ``lo = v - v.astype(bf16).astype(f32)``
    is UNSOUND at the XLA level on this TPU: the compile service sets
    --xla_allow_excess_precision=true, which lets XLA cancel the
    demote/promote pair and fold ``lo`` to zero whenever v is not a
    constant — silently dropping the low pass of every bf16x2/x3 matmul
    (measured: 1.4e-3 relative RMS, i.e. bf16-level error, on the
    rational pallas path). The integer formulation has no demote/promote
    pair to cancel and is exact by construction. Safe both at XLA level
    and inside Pallas kernels (same-width bitcasts, uint32 adds). Not
    NaN-payload-preserving (irrelevant for filter data).
    """
    f32 = jnp.float32
    bits = jax.lax.bitcast_convert_type(v.astype(f32), jnp.uint32)
    rounded = bits + jnp.uint32(0x7FFF) + ((bits >> jnp.uint32(16))
                                           & jnp.uint32(1))
    hi_f32 = jax.lax.bitcast_convert_type(
        rounded & jnp.uint32(0xFFFF0000), f32)
    return hi_f32.astype(jnp.bfloat16), (v - hi_f32).astype(jnp.bfloat16)


def split_bf16_kernel(v):
    """(hi, lo) bf16 split for use INSIDE Pallas kernel bodies only:
    hi = hardware RTNE demote, lo = (v - hi) demoted.

    4 vreg-ops (demote, promote, sub, demote) vs split_bf16_trunc's 6,
    and one bit tighter (|lo| <= 2^-9 |v|, trunc 2^-8). This is the
    "naive" round-based split that is UNSOUND at the XLA level (the
    compile service's --xla_allow_excess_precision lets XLA cancel the
    demote/promote pair and fold lo to 0 — ops/precision.py:split_bf16)
    — but Mosaic's lowering does no such cancellation: verified
    empirically on v5e (lo nonzero on 100% of random lanes, max |lo|/|v|
    = 2^-8.95, hi+lo reconstruction error 2^-17.2). bench.py's
    end-to-end oracle RMS check (budget 1e-4; a folded lo measures
    1.4e-3) is the regression guard — interpret-mode tests cannot catch
    a Mosaic-level folding. NEVER use outside a Pallas kernel body."""
    hi = v.astype(jnp.bfloat16)
    return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def split_bf16_trunc(v):
    """Cheap (hi, lo) bf16 split: hi = v TRUNCATED to bf16 (mantissa mask,
    no round-to-nearest), lo = v - hi.

    Half the vreg-ops of ``split_bf16`` (mask + sub + two casts vs the
    9-op rounding sequence) at one bit less accuracy: |lo| <= 2^-8 |v|
    (vs 2^-9), so a 3-pass matmul's dropped xl*kl term sits at ~2^-17
    relative (vs ~2^-18) — both far inside the 1e-4 budget. Use this for
    the DATA-side splits inside Pallas kernel bodies, where the split
    runs per tile over the whole block and its vreg-ops compete with the
    HBM-bound budget (measured ~10% of the zc kernel's tile time);
    host/XLA-level K splits keep the rounding version (free, amortized).
    Same optimization-proofness: no demote/promote pair for XLA's
    excess-precision folding to cancel."""
    f32 = jnp.float32
    bits = jax.lax.bitcast_convert_type(v.astype(f32), jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), f32)
    return hi_f32.astype(jnp.bfloat16), (v - hi_f32).astype(jnp.bfloat16)
