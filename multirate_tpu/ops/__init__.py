"""Kernel layer (L1+L2 in SURVEY.md): polyphase banks, closed-form index
machinery, batched block filtering, and the user-facing filt API.

Reference counterparts: src/support.jl (compute primitives), src/Filters.jl
(kernels, state machines, length algebra, API).
"""

from .pfb import taps2pfb, polyfit, polyval, pfb2pnfb
from .params import (
    PHASE_FRAC_BITS, PHASE_ONE,
    FIRStandard, FIRInterpolator, FIRDecimator, FIRRational,
    FIRArbitrary, FIRFarrow, FilterState, init_state, make_kernel,
)
from .compute import filt_block_raw, filt_block_tm_raw
from .api import (
    filt, filt_block, filt_block_inplace, filt_block_tm,
    FIRFilter, setphase, reset,
    tapsforphase,
    outputlength, inputlength, nextphase, max_outputs,
)

__all__ = [
    "taps2pfb", "polyfit", "polyval", "pfb2pnfb",
    "PHASE_FRAC_BITS", "PHASE_ONE",
    "FIRStandard", "FIRInterpolator", "FIRDecimator", "FIRRational",
    "FIRArbitrary", "FIRFarrow", "FilterState", "init_state", "make_kernel",
    "filt", "filt_block", "filt_block_inplace", "filt_block_raw",
    "filt_block_tm", "filt_block_tm_raw",
    "FIRFilter", "setphase", "reset",
    "tapsforphase", "outputlength", "inputlength", "nextphase", "max_outputs",
]
from . import quant  # noqa: E402,F401  (int8 quantized mode)
