"""Decompose the arb/Farrow gridsel oracle RMS on the TPU (VERDICT r3 #7).

BENCH_r03 measured arb-gridsel oracle RMS 6.03e-5 vs 8.1e-6 Farrow and
~3e-6 rational — 1.7x under the 1e-4 budget with no root-cause. Candidate
stages: (a) the 3-pass bf16-split band matmul (drops the xl*kl term,
~2^-16 relative per product), (b) the f32 alpha linearization
alin = a0 + rowf*deps inside a tile, (c) the one-hot tapvec matmul.

This experiment reruns the bench accuracy check (first 200k samples vs
the float64 host oracle) with staged ablations:
  - default fused kernel (three_pass=True)
  - three_pass=False (in-kernel HIGHEST = 6-pass, near-exact f32)
isolating (a); and compares against CPU-interpret (exact f32 dots) for
the residual (b)+(c).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp34_rms_ablate.py
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import multirate_tpu as mr
    from multirate_tpu.ops import gridsel as G
    from multirate_tpu.ops import indexing as idx
    from multirate_tpu.utils.oracle import naivefilt, naivefilt_farrow

    print("device:", jax.devices()[0].device_kind, flush=True)
    N = 200_000
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(N).astype(np.float32)
    x = jnp.asarray(x_np)
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    h64 = ha.astype(np.float64)
    x64 = x_np.astype(np.float64)

    import multirate_tpu.ops.pallas.gridsel as PG

    orig_launch = PG._launch_fused

    results = {}
    for name, spec in [("arb", dict(rate=0.4709, nphi=32)),
                       ("farrow", dict(rate=0.4709, nphi=32, polyorder=4))]:
        p = mr.make_kernel(ha, **spec)
        n_exp = int(idx.outputlength(p, N))
        if name == "arb":
            ref = naivefilt(h64, x64, 0.4709, 32)
        else:
            ref = naivefilt_farrow(h64, x64, 0.4709, 32, 4)

        def rms_of(three_pass):
            def launch(kern, packs, xrows, banks, meta_t, num_tiles,
                       interpret, **kwargs):
                import functools

                # kern is functools.partial(_kernel_*_fused, ...,
                # three_pass=...); rebuild with the ablated flag
                kw = dict(kern.keywords, three_pass=three_pass)
                k2 = functools.partial(kern.func, **kw)
                return orig_launch(k2, packs, xrows, banks, meta_t,
                                   num_tiles, interpret, **kwargs)

            PG._launch_fused = launch
            try:
                st = mr.init_state(p, (), jnp.float32)
                y, cnt, _ = mr.filt_block(p, st, x, path="gridsel")
                got = np.asarray(y)[: int(cnt)].astype(np.float64)
            finally:
                PG._launch_fused = orig_launch
            n = min(len(ref), len(got), n_exp)
            num = np.sqrt(np.mean((got[:n] - ref[:n]) ** 2))
            den = np.sqrt(np.mean(ref[:n] ** 2))
            return float(num / den)

        r3 = rms_of(True)
        r6 = rms_of(False)
        results[name] = (r3, r6)
        print(f"{name}: three_pass(bf16x3)={r3:.3e}  HIGHEST(6pass)={r6:.3e}"
              f"  -> 3-pass contribution ~{max(r3 - r6, 0):.1e}", flush=True)
    print(results)


if __name__ == "__main__":
    main()
