"""Shared differential-test machinery.

Implements the reference's 4-way test methodology (runtests.jl:44-96 and
analogues): oracle vs stateless vs stateful-2-chunk vs piecewise-1-sample,
all elementwise-compared with first-divergence reporting.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

import multirate_tpu as mr
from multirate_tpu.utils.oracle import naivefilt
from multirate_tpu.utils.testing import assert_close


def run_chunked(h, ratio_or_rate, x, chunks, nphi=32, polyorder=None,
                path="auto"):
    """Feed x through one FIRFilter in the given chunk lengths; concatenate."""
    f = mr.FIRFilter(h, ratio_or_rate, nphi=nphi, polyorder=polyorder,
                     path=path)
    out = []
    i = 0
    for c in chunks:
        out.append(np.asarray(f.filt(x[..., i:i + c])))
        i += c
    assert i == x.shape[-1]
    return np.concatenate(out, axis=-1)


def pivot_chunks(xlen: int, pivot: int):
    return [pivot, xlen - pivot]


def one_sample_chunks(xlen: int):
    return [1] * xlen


def four_way(h, x, ratio, rng, rtol=None, atol=0.0, path="auto"):
    """Oracle / stateless / 2-chunk / 1-sample-piecewise comparison for the
    rational-family kernels (reference: runtests.jl:44-96 etc.)."""
    ratio = Fraction(*ratio) if isinstance(ratio, tuple) else Fraction(ratio)
    oracle = naivefilt(np.asarray(h, dtype=np.float64),
                       np.asarray(x, dtype=np.complex128 if
                                  np.iscomplexobj(x) else np.float64), ratio)
    out_dt = np.promote_types(np.asarray(h).dtype, np.asarray(x).dtype)
    oracle = oracle.astype(out_dt)

    stateless = np.asarray(mr.filt(h, x, ratio, path=path))
    assert_close(stateless, oracle, rtol=rtol, atol=atol, label="stateless")

    xlen = x.shape[-1]
    pivot = int(min(rng.integers(50, 150), xlen // 4)) or 1
    two = run_chunked(h, ratio, x, pivot_chunks(xlen, pivot), path=path)
    assert_close(two, oracle, rtol=rtol, atol=atol, label="stateful-2chunk")

    piece = run_chunked(h, ratio, x, one_sample_chunks(xlen), path=path)
    assert_close(piece, oracle, rtol=rtol, atol=atol, label="piecewise")
    return oracle


def default_rtol(*dts) -> float:
    dt = np.promote_types(*dts) if len(dts) > 1 else np.dtype(dts[0])
    return float(np.sqrt(np.finfo(np.asarray(0, dt).real.dtype).eps))
