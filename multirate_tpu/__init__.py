"""multirate_tpu — a TPU-native multirate signal-processing framework.

A brand-new JAX/XLA/Pallas implementation of the full capability surface of
Multirate.jl (streaming polyphase FIR filtering and sample-rate conversion):

- six filter kernels: single-rate FIR, integer interpolator (L//1), integer
  decimator (1//M), rational resampler (L//M), arbitrary real-rate resampler
  (derivative-bank linear interpolation), and Farrow polynomial resampler
  (reference: /root/reference/src/Filters.jl:15-147),
- a windowed-sinc FIR designer with Kaiser length/beta estimation
  (reference: /root/reference/src/FIRDesign.jl),
- naive reference resamplers used as test oracles
  (reference: /root/reference/src/NaiveResamplers.jl),
- streaming (stateful, chunked) ``filt`` semantics where chunked output
  equals whole-vector output: every index/phase decision is exactly
  chunking-invariant (int64 fixed point), so sample alignment is bit-exact;
  float values match to XLA reduction-order noise (~1 ulp)
  (reference invariant: /root/reference/test/runtests.jl:72-96).

Design stance (NOT a port): the reference's sequential mutable-state loops are
replaced by closed-form affine index math feeding batched contractions
(MXU-friendly), pure-functional ``FilterState`` pytrees threaded through jitted
block steps, exact integer fixed-point phase accumulators (so chunked == whole
holds bit-exactly by construction), and device-mesh sharding (channels = data
parallel, time blocks = sequence parallel with halo exchange).

This package enables JAX 64-bit mode at import: exact streaming phase
accumulators are carried as int64 fixed-point integers, which silently degrade
to int32 without it. Signal data paths remain float32/bfloat16 by default.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .design import (  # noqa: E402
    FIRResponse,
    LOWPASS,
    BANDPASS,
    HIGHPASS,
    BANDSTOP,
    firdes,
    firdes_remez,
    firprototype,
    kaiserlength,
    kaiser,
    hanning,
    hamming,
    blackman,
    rect,
)
from .ops import (  # noqa: E402
    PHASE_FRAC_BITS,
    PHASE_ONE,
    make_kernel,
    FIRFilter,
    FIRStandard,
    FIRInterpolator,
    FIRDecimator,
    FIRRational,
    FIRArbitrary,
    FIRFarrow,
    FilterState,
    filt,
    filt_block,
    filt_block_inplace,
    filt_block_tm,
    init_state,
    inputlength,
    max_outputs,
    nextphase,
    outputlength,
    polyfit,
    polyval,
    pfb2pnfb,
    reset,
    setphase,
    taps2pfb,
    tapsforphase,
)

__version__ = "0.1.0"

__all__ = [
    "FIRResponse", "LOWPASS", "BANDPASS", "HIGHPASS", "BANDSTOP",
    "firdes", "firdes_remez", "firprototype", "kaiserlength",
    "kaiser", "hanning", "hamming", "blackman", "rect",
    "PHASE_FRAC_BITS", "PHASE_ONE", "make_kernel",
    "FIRFilter", "FIRStandard", "FIRInterpolator", "FIRDecimator",
    "FIRRational", "FIRArbitrary", "FIRFarrow", "FilterState",
    "filt", "filt_block", "filt_block_inplace", "filt_block_tm",
    "init_state",
    "inputlength", "max_outputs",
    "nextphase", "outputlength", "polyfit", "polyval", "pfb2pnfb", "reset",
    "setphase", "taps2pfb", "tapsforphase",
    "quant",
]

from .ops import quant  # noqa: E402  (int8 quantized mode)
