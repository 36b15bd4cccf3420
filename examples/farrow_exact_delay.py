"""Exact fractional-sample delay with setphase.

Python analogue of the reference's examples/FIRFarrow.jl:25-33 and the
interactive Farrow notebook: resample at rate 1.0 while phase-offsetting the
polyphase bank to realize a precise sub-sample delay.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import multirate_tpu as mr


def main():
    nphi = 32
    numtaps, beta = mr.kaiserlength(0.05, samplerate=nphi)
    numtaps = -(-numtaps // nphi) * nphi
    h = (mr.firdes(numtaps, 0.45, mr.kaiser, samplerate=nphi, beta=beta)
         * nphi)

    t = np.arange(2000, dtype=np.float64)
    x = np.sin(2 * np.pi * 0.01 * t)

    base_delay = len(h) / (2 * nphi) - 1 / nphi
    for frac in (0.0, 0.25, 0.5):
        f = mr.FIRFilter(h, 1.0, nphi=nphi)
        f.setphase(frac)
        y = np.asarray(f.filt(x))
        expect = np.sin(2 * np.pi * 0.01 * (t - base_delay + frac))
        err = np.abs(y[200:1800] - expect[200:1800]).max()
        print(f"setphase({frac}): sub-sample delay error {err:.2e}")

    # Farrow variant: same trick, polynomial-generated taps
    f = mr.FIRFilter(h, 1.0, nphi=nphi, polyorder=4)
    f.setphase(0.5)
    y = np.asarray(f.filt(x))
    expect = np.sin(2 * np.pi * 0.01 * (t - base_delay + 0.5))
    print(f"farrow setphase(0.5): error {np.abs(y[200:1800]-expect[200:1800]).max():.2e}")


if __name__ == "__main__":
    main()
