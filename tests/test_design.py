"""Filter-design layer tests (reference behavior: src/FIRDesign.jl).

Constants and prototypes are pinned against scipy equivalents where they
exist, plus hand-derived values from the reference formulas.
"""

import numpy as np
import pytest
import scipy.signal as sps

import multirate_tpu as mr


def test_windows_match_numpy():
    for n in (8, 33, 64):
        np.testing.assert_allclose(mr.hanning(n), np.hanning(n), atol=1e-12)
        np.testing.assert_allclose(mr.hamming(n), np.hamming(n), atol=1e-12)
        np.testing.assert_allclose(mr.blackman(n), np.blackman(n), atol=1e-12)
        np.testing.assert_allclose(mr.kaiser(n, 7.0), np.kaiser(n, 7.0),
                                   atol=1e-12)
        assert mr.rect(n).sum() == n


def test_kaiserlength_formula():
    # numtaps = ceil((atten - 7.95) / (2*pi*2.285*transition)) — FIRDesign.jl:21
    numtaps, beta = mr.kaiserlength(0.05, 60.0)
    assert numtaps == int(np.ceil((60 - 7.95) / (2 * np.pi * 2.285 * 0.05)))
    # beta piecewise, attenuation > 50 branch — FIRDesign.jl:24-29
    assert beta == pytest.approx(0.1102 * (60 - 8.7))
    _, beta21 = mr.kaiserlength(0.05, 30.0)
    assert beta21 == pytest.approx(0.5842 * 9 ** 0.4 + 0.07886 * 9)
    _, beta0 = mr.kaiserlength(0.05, 10.0)
    assert beta0 == 0.0
    # samplerate normalizes the transition width — FIRDesign.jl:20
    n_a, _ = mr.kaiserlength(0.05, 60.0)
    n_b, _ = mr.kaiserlength(0.05 * 32, 60.0, samplerate=32)
    assert n_a == n_b


def test_kaiserlength_matches_scipy():
    numtaps, beta = mr.kaiserlength(0.1, 60.0)
    sp_n, sp_beta = sps.kaiserord(60.0, 0.1 * 2)  # scipy width in [0,1]=Nyq
    assert beta == pytest.approx(sp_beta, rel=1e-9)
    assert abs(numtaps - sp_n) <= 2  # both ceil the same analytic estimate


@pytest.mark.parametrize("numtaps", [21, 64])
def test_lowpass_prototype_vs_scipy(numtaps):
    cutoff = 0.2
    h = mr.firdes(numtaps, cutoff, mr.kaiser, beta=7.0)
    ref = sps.firwin(numtaps, 2 * cutoff, window=("kaiser", 7.0), scale=False)
    np.testing.assert_allclose(h, ref, atol=1e-12)


def test_highpass_forces_type1():
    # HIGHPASS with odd M bumps numtaps by one (type-1) — FIRDesign.jl:56
    h = mr.firdes(22, 0.2, mr.hanning, response=mr.HIGHPASS)
    assert len(h) == 23
    h2 = mr.firdes(23, 0.2, mr.hanning, response=mr.HIGHPASS)
    assert len(h2) == 23


def test_bandpass_bandstop_prototypes():
    n = np.arange(33)
    bp = mr.firprototype(33, (0.1, 0.3), response=mr.BANDPASS)
    lo = 2 * 0.1 * np.sinc(2 * 0.1 * (n - 16))
    hi = 2 * 0.3 * np.sinc(2 * 0.3 * (n - 16))
    np.testing.assert_allclose(bp, lo - hi, atol=1e-12)
    bs = mr.firprototype(33, (0.1, 0.3), response=mr.BANDSTOP)
    np.testing.assert_allclose(bs, hi - lo, atol=1e-12)


def test_spec_driven_firdes():
    # firdes(cutoff, transition, attenuation) chains kaiserlength
    # (FIRDesign.jl:90-95)
    h = mr.firdes(0.25, 0.05, 60.0)
    numtaps, beta = mr.kaiserlength(0.05, 60.0)
    ref = mr.firdes(numtaps, 0.25, mr.kaiser, beta=beta)
    np.testing.assert_allclose(h, ref, atol=1e-12)


def test_samplerate_scaling():
    h_a = mr.firdes(33, 0.25, mr.kaiser, beta=5.0)
    h_b = mr.firdes(33, 0.25 * 48e3, mr.kaiser, samplerate=48e3, beta=5.0)
    np.testing.assert_allclose(h_a, h_b, atol=1e-12)


def test_lowpass_dc_gain():
    # A lowpass windowed-sinc should have ~unity DC gain.
    h = mr.firdes(0.25, 0.02, 80.0)
    assert abs(h.sum() - 1.0) < 1e-3


def test_firdes_remez_responses():
    """Equiripple designer (reference has windowed-sinc only): passband
    ~unity / stopband attenuated for all four response types; matches a
    direct scipy.signal.remez call."""
    import multirate_tpu as mr
    from scipy.signal import freqz, remez

    def mag(h, f):
        w, resp = freqz(h, worN=2048)
        idx = (np.abs(w / np.pi / 2 - np.asarray(f))).argmin() \
            if np.isscalar(f) else None
        return w / (2 * np.pi), np.abs(resp)

    h = mr.firdes_remez(101, 0.18, 0.24)
    fgrid, m = mag(h, None)
    assert np.all(np.abs(m[fgrid < 0.15] - 1) < 0.02)
    assert np.all(m[fgrid > 0.26] < 0.02)
    np.testing.assert_allclose(
        h, remez(101, [0, 0.18, 0.24, 0.5], [1, 0], fs=1.0))

    h = mr.firdes_remez(101, 0.3, 0.24, mr.HIGHPASS)
    fgrid, m = mag(h, None)
    assert np.all(np.abs(m[fgrid > 0.32] - 1) < 0.02)
    assert np.all(m[fgrid < 0.22] < 0.02)

    h = mr.firdes_remez(145, (0.2, 0.3), (0.15, 0.35), mr.BANDPASS)
    fgrid, m = mag(h, None)
    assert np.all(np.abs(m[(fgrid > 0.22) & (fgrid < 0.28)] - 1) < 0.03)
    assert np.all(m[fgrid < 0.13] < 0.03) and np.all(m[fgrid > 0.37] < 0.03)

    h = mr.firdes_remez(121, (0.12, 0.38), (0.2, 0.3), mr.BANDSTOP)
    fgrid, m = mag(h, None)
    assert np.all(m[(fgrid > 0.22) & (fgrid < 0.28)] < 0.03)
    with pytest.raises(ValueError):
        mr.firdes_remez(65, 0.3, 0.2)  # edges not increasing (lowpass)
