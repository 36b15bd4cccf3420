"""bf16 zc headline ablation (VERDICT r3 #6): JT sweep + store dtype.

bf16 measured only 1.2x the f32 headline (61.3 vs 50.7 Gsps) where
halved HBM traffic + single-pass MXU should give ~2x. Candidates: the
S=16 row quantum's tile geometry (default JT tuned on f32/S=8), the
bf16 output store path ((16, 128) memory tiles), widen/narrow casts.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp41_bf16_zc.py
"""
import os
import subprocess
import sys
import time

CHILD = r"""
import os, time
import numpy as np
import jax, jax.numpy as jnp
from fractions import Fraction
import multirate_tpu as mr
from multirate_tpu.utils.metrics import chained_seconds_per_call

mode = os.environ["ZC_MODE"]
jt_env = os.environ.get("ZC_JT_OVERRIDE")
if jt_env:
    from multirate_tpu.ops.pallas import rational2 as r2
    r2.ZC_JT_OVERRIDE = int(jt_env)
N = 8_000_000
ratio = Fraction(147, 160)
rng = np.random.default_rng(0)
x_np = rng.standard_normal(N).astype(np.float32)
h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147)
if mode == "f32":
    hh, xx, sd = np.asarray(h, np.float32), jnp.asarray(x_np), jnp.float32
else:
    hh = np.asarray(jnp.asarray(h, jnp.bfloat16))
    xx, sd = jnp.asarray(x_np, jnp.bfloat16), jnp.bfloat16
p = mr.make_kernel(hh, ratio=ratio)
st = mr.init_state(p, (), sd)
sec = chained_seconds_per_call(p, st, xx, "pallas", repeat=40, iters=4,
                               target_t1=0.8)
print(f"RES {mode} JT={os.environ.get('ZC_JT_OVERRIDE','-')} "
      f"{sec*1e3:.4f} ms {xx.size/sec/1e6:.0f} Msps", flush=True)
"""


def main():
    jobs = [("f32", {}), ("bf16", {})]
    jobs += [("bf16", {"ZC_JT_OVERRIDE": str(j)})
             for j in (192, 256, 512, 576)]
    for mode, extra in jobs:
        env = dict(os.environ, ZC_MODE=mode, **extra)
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=900)
        rows = [ln for ln in r.stdout.splitlines() if ln.startswith("RES")]
        print(f"[{mode:>5} {extra}] " + " | ".join(rows)
              + f"  ({time.time()-t0:.0f}s)", flush=True)
        if r.returncode:
            print(r.stderr[-800:], flush=True)


if __name__ == "__main__":
    main()
