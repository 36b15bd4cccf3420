"""Frequency-domain end-to-end validation: in-band tones survive at unity
gain, out-of-band tones are rejected to the design's stopband depth before
they can alias. Complements the time-domain differential suite with a
physical check of the whole design->polyphase->resample pipeline
(reference analogue: the DAT->CD and naive-vs-polyphase examples eyeball
spectra; here the assertion is quantitative).
"""

from fractions import Fraction

import numpy as np

import multirate_tpu as mr

FS = 48_000.0


def _tones(freqs, seconds=4.0):
    t = np.arange(int(seconds * FS)) / FS
    return sum(np.sin(2 * np.pi * f0 * t) for f0 in freqs).astype(np.float32)


def _peak(y, fs_out, f0, bw=40.0):
    n = len(y)
    Y = np.abs(np.fft.rfft(y * np.hanning(n)))
    f = np.fft.rfftfreq(n, 1 / fs_out)
    m = (f > f0 - bw) & (f < f0 + bw)
    return float(Y[m].max()), n


def test_decimator_alias_rejection():
    """1 kHz through a 1//4 decimator at unity gain; an 8.5 kHz tone
    (which would alias to 3.5 kHz) crushed by >= 80 dB."""
    x = _tones([1000.0, 8500.0])
    h = np.asarray(mr.firdes(256, 0.5 / 4 * 0.85, mr.kaiser, beta=9.0),
                   np.float32)
    y = np.asarray(mr.filt(h, x, Fraction(1, 4)), np.float64)
    p1k, n = _peak(y, FS / 4, 1000.0)
    palias, _ = _peak(y, FS / 4, 3500.0)
    rej_db = 20 * np.log10(p1k / max(palias, 1e-300))
    assert rej_db > 80.0, rej_db
    amp = p1k / (np.hanning(n).sum() / 2)
    assert abs(amp - 1.0) < 1e-3, amp


def test_rational_tone_preservation():
    """DAT->CD (147//160) with the reference's example filter: a 1 kHz
    tone lands at 1 kHz in the 44.1 kHz stream at unity amplitude."""
    x = _tones([1000.0], seconds=2.0)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    y = np.asarray(mr.filt(h, x, Fraction(147, 160)), np.float64)
    p1k, n = _peak(y, 44_100.0, 1000.0)
    amp = p1k / (np.hanning(n).sum() / 2)
    assert abs(amp - 1.0) < 1e-3, amp
    # nothing significant anywhere else: next-largest off-tone peak is
    # the windowing skirt, >= 60 dB down
    Y = np.abs(np.fft.rfft(y * np.hanning(n)))
    f = np.fft.rfftfreq(n, 1 / 44_100.0)
    off = Y[(f < 900) | (f > 1100)].max()
    assert 20 * np.log10(p1k / off) > 60.0


def test_arbitrary_rate_tone_position():
    """Arbitrary-rate resample moves a tone to the right absolute
    frequency: 3 kHz at 48 kHz resampled by rate r stays 3 kHz at
    fs_out = 48 kHz * r (the arb accumulator advances exactly)."""
    rate = 0.9173
    x = _tones([3000.0], seconds=2.0)
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    y = np.asarray(mr.filt(ha, x, rate, 32), np.float64)
    fs_out = FS * rate
    n = len(y)
    Y = np.abs(np.fft.rfft(y * np.hanning(n)))
    f = np.fft.rfftfreq(n, 1 / fs_out)
    f_peak = float(f[np.argmax(Y)])
    assert abs(f_peak - 3000.0) < 2.0, f_peak
    amp = Y.max() / (np.hanning(n).sum() / 2)
    assert abs(amp - 1.0) < 5e-3, amp
