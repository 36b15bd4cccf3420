"""48 kHz (DAT) -> 44.1 kHz (CD) sample-rate conversion.

Python analogue of the reference's examples/DAT to CD.jl:6-16: 147//160
rational resampling with a 24*147-tap Kaiser filter (beta 7.8562, cutoff
0.5/147, taps scaled by 147 for unity passband gain).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from fractions import Fraction

import multirate_tpu as mr


def main():
    fs_in = 48_000.0
    ratio = Fraction(147, 160)

    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)

    t = np.arange(int(fs_in)) / fs_in
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)

    y = np.asarray(mr.filt(h, x, ratio))
    print(f"in : {len(x)} samples @ {fs_in:.0f} Hz")
    print(f"out: {len(y)} samples @ {fs_in * float(ratio):.0f} Hz")

    # streaming variant: identical output, chunk by chunk
    f = mr.FIRFilter(h, ratio)
    chunks = [np.asarray(f.filt(x[i:i + 4800])) for i in
              range(0, len(x), 4800)]
    yc = np.concatenate(chunks)
    print(f"chunked == whole: {np.abs(yc - y).max():.2e} max abs diff")


if __name__ == "__main__":
    main()
