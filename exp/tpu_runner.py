"""Long-lived TPU measurement runner.

Waits for relay recovery (subprocess trivial-jit canaries, 10-min spacing),
then runs every remaining measurement IN-PROCESS sequentially — no process
kills, so a slow compile just waits instead of re-wedging the relay.

Stages:
  A. rational grouped-kernel variants (HIGHEST vs 3-pass, g=2 vs g=4)
  B. select3 fused arb/Farrow: correctness + chained timing
  C. full bench.py (writes BENCH_SIDECAR.json)

Run detached:  nohup python exp/tpu_runner.py > /tmp/runner.log 2>&1 &
(with PYTHONPATH=/root/repo:/root/.axon_site)
"""

import os
import subprocess
import sys
import time
from functools import partial

import numpy as np

REPO = "/root/repo"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def wait_for_relay(max_attempts=40):
    env = dict(os.environ, PYTHONPATH="/root/.axon_site")
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jax.jit(lambda a:(a+1).sum())(jnp.ones(8))));"
            "print('HEALTHY')")
    for i in range(max_attempts):
        log(f"canary attempt {i + 1}")
        try:
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True, timeout=550)
            if "HEALTHY" in r.stdout:
                log("relay healthy")
                return True
        except subprocess.TimeoutExpired:
            pass
        log("unhealthy; sleeping 480s")
        time.sleep(480)
    return False


def stage_a(jax, jnp, mr):
    from multirate_tpu.ops.pallas.rational import build_k_matrix
    from multirate_tpu.ops.pallas.rational2 import (
        rational_supercycle_grouped, band_groups)

    N = 1_000_000
    L, M, T = 147, 160, 24
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    pfb = np.asarray(mr.taps2pfb(h, L), np.float32)
    x = jax.random.normal(jax.random.key(0), (N,), dtype=jnp.float32)
    ks, gps = {}, {}
    for g in (2, 4):
        k0 = build_k_matrix(pfb, L, M, phi0=1, origin=0, group=g)
        ks[g] = jnp.asarray(np.concatenate(
            [k0, np.zeros((M, k0.shape[1]), np.float32)], axis=0))
        gps[g] = band_groups(T, L, M, g)
    n_out = 919_687
    yref = {}

    for name, g, tp in [("g2-HIGHEST", 2, False), ("g2-3pass", 2, True),
                        ("g4-3pass", 4, True), ("g4-HIGHEST", 4, False)]:
        log(f"A:{name} compiling...")
        t0 = time.perf_counter()
        y = np.asarray(rational_supercycle_grouped(
            x, ks[g], g * L, g * M, n_out, gps[g], three_pass=tp))
        log(f"A:{name} compile+run {time.perf_counter()-t0:.1f}s")
        yref[name] = y
        if "g2-HIGHEST" in yref and name != "g2-HIGHEST":
            rel = np.abs(y - yref["g2-HIGHEST"]).max() / \
                np.abs(yref["g2-HIGHEST"]).max()
            log(f"A:{name} rel vs g2-HIGHEST = {rel:.2e}")

        @partial(jax.jit, static_argnames=("reps",))
        def many(xx, reps, _g=g, _tp=tp):
            def body(i, c):
                xx, acc = c
                yy = rational_supercycle_grouped(
                    xx, ks[_g], _g * L, _g * M, n_out, gps[_g],
                    three_pass=_tp)
                last = yy[-1]
                return (xx * (1.0 + last * 1e-30), acc + last)
            return jax.lax.fori_loop(0, reps, body,
                                     (xx, jnp.zeros((), xx.dtype)))[1]

        def tmin(reps):
            float(many(x, reps))
            return min(time_once(many, x, reps) for _ in range(4))

        def time_once(f, xx, reps):
            t0 = time.perf_counter()
            float(f(xx, reps))
            return time.perf_counter() - t0

        t1, t2 = tmin(50), tmin(450)
        sec = max((t2 - t1) / 400, 1e-9)
        log(f"A:{name}: {sec*1e3:.3f} ms -> {N/sec/1e6:.0f} Msps")


def stage_b(jax, jnp, mr):
    from multirate_tpu.utils.metrics import chained_seconds_per_call
    import multirate_tpu.ops.compute as comp

    N = 1_000_000
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    x = jax.random.normal(jax.random.key(1), (N,), dtype=jnp.float32)
    for name, kw, rate in [("arb", {}, 0.4709),
                           ("farrow", {"polyorder": 4}, 0.4709),
                           ("arb-up", {}, 1.7238754)]:
        p = mr.make_kernel(ha, rate=rate, nphi=32, **kw)
        st = mr.init_state(p, (), jnp.float32)
        log(f"B:{name} correctness (50k)...")
        yw = np.asarray(comp.filt_block_raw(p, st, x[:50_000],
                                            "windows")[0])
        y3 = np.asarray(comp.filt_block_raw(p, st, x[:50_000],
                                            "winsel")[0])
        log(f"B:{name} v3 vs windows rel="
            f"{np.abs(y3-yw).max()/np.abs(yw).max():.2e}")
        sec = chained_seconds_per_call(p, st, x, "winsel",
                                       repeat=20, iters=4)
        log(f"B:{name} [winsel-v3]: {sec*1e3:.3f} ms "
            f"-> {N/sec/1e6:.0f} Msps")


def main():
    os.chdir(REPO)
    if not wait_for_relay():
        log("gave up waiting for relay")
        return 1
    import jax
    import jax.numpy as jnp

    log("device:", jax.devices()[0].device_kind)
    import multirate_tpu as mr

    wanted = sys.argv[1] if len(sys.argv) > 1 else "ABC"
    for name, fn in [("A", stage_a), ("B", stage_b)]:
        if name not in wanted:
            continue
        try:
            fn(jax, jnp, mr)
        except Exception as e:   # noqa: BLE001
            log(f"stage {name} FAILED: {type(e).__name__}: {e}")

    if "C" not in wanted:
        log("runner done")
        return 0
    log("stage C: full bench")
    try:
        import bench
        bench.main()
        subprocess.run([sys.executable, "exp/perf_table.py", "--apply"],
                       cwd=REPO, check=False)
        log("README perf table refreshed from sidecar")
    except Exception as e:       # noqa: BLE001
        log(f"bench FAILED: {type(e).__name__}: {e}")
    log("runner done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
