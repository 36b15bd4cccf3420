"""Stage ablation of the single-channel gridsel kernels on TPU at 8M.

Spawns one subprocess per GRIDSEL_ABLATE setting (timing-only; outputs are
numerically wrong for ablated stages). Identifies where tile time goes:
placement stages vs band matmuls vs tap one-hots vs variant duplication.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp31_gridsel_ablate.py
"""
import os
import subprocess
import sys
import time

ABLATIONS = ["", "nomm", "nosel", "nomm,nosel"]

CHILD = r"""
import os, time
import numpy as np
import jax, jax.numpy as jnp
import multirate_tpu as mr
from multirate_tpu.utils.metrics import chained_seconds_per_call

N = 8_000_000
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
      ).astype(np.float32)
for name, spec in [("arb", dict(rate=0.4709, nphi=32)),
                   ("farrow", dict(rate=0.4709, nphi=32, polyorder=4))]:
    p = mr.make_kernel(ha, **spec)
    st = mr.init_state(p, (), jnp.float32)
    sec = chained_seconds_per_call(p, st, x, "gridsel",
                                   repeat=30, iters=4, target_t1=0.8)
    print(f"RES {name} {sec*1e3:.4f} ms {x.size/sec/1e6:.0f} Msps",
          flush=True)
"""


def main():
    for ab in ABLATIONS:
        env = dict(os.environ, GRIDSEL_ABLATE=ab)
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=900)
        rows = [ln for ln in r.stdout.splitlines() if ln.startswith("RES")]
        print(f"[{ab or 'full':>22}] " + " | ".join(rows)
              + f"  ({time.time()-t0:.0f}s)", flush=True)
        if r.returncode:
            print(r.stderr[-500:], flush=True)


if __name__ == "__main__":
    main()
