"""Client-side lowering probes (no TPU execution needed beyond init):
find the dynamic_slice that crashed bench's rational pallas path, and
verify select3's rotate-based slices lower."""

import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_lower(name, fn, *args):
    try:
        jax.jit(fn).lower(*args)
        log(f"{name}: LOWERED OK")
        return True
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}")
        tb = traceback.format_exc().splitlines()
        for line in tb:
            if "multirate_tpu" in line:
                log("   ", line.strip())
        return False


def main():
    from fractions import Fraction

    import multirate_tpu as mr
    from multirate_tpu.ops.compute import filt_block_raw

    log("device:", jax.devices()[0].device_kind)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=Fraction(147, 160))
    x = jnp.ones((1_000_000,), jnp.float32)
    st = mr.init_state(params, (), jnp.float32)
    try_lower("rational pallas 1M", lambda s, xx: filt_block_raw(
        params, s, xx, "pallas"), st, x)

    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    pa = mr.make_kernel(ha, rate=0.4709, nphi=32)
    sa = mr.init_state(pa, (), jnp.float32)
    try_lower("arb winsel v3 1M", lambda s, xx: filt_block_raw(
        pa, s, xx, "winsel"), sa, x)
    pf = mr.make_kernel(ha, rate=0.4709, nphi=32, polyorder=4)
    sf = mr.init_state(pf, (), jnp.float32)
    try_lower("farrow winsel v3 1M", lambda s, xx: filt_block_raw(
        pf, s, xx, "winsel"), sf, x)

    # the other bench configs
    h147 = np.asarray(mr.firdes(147, 0.2, mr.kaiser, beta=7.0), np.float32)
    for name, spec in [("standard", Fraction(1, 1)),
                       ("decim", Fraction(1, 4)),
                       ("interp", Fraction(4, 1))]:
        p = mr.make_kernel(h147, ratio=spec)
        s0 = mr.init_state(p, (), jnp.float32)
        try_lower(f"{name} pallas 1M", lambda s, xx, _p=p: filt_block_raw(
            _p, s, xx, "pallas"), s0, x)


if __name__ == "__main__":
    main()
