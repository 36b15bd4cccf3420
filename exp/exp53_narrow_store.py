"""Interleaved probes: balanced copy vs 1:4 expand with f32/bf16/int8
output stores — the structural question behind the interp write-wall
(VERDICT r5 item 4): do narrow output stores break the 1:4 write ceiling,
or does Mosaic's narrowing relayout (docs/kernels.md law 4) eat the byte
saving?

All probes run INTERLEAVED in one process (3 rounds) — the only valid
comparison on the pace-drifting relay (CLAUDE.md perf law 6).

Run (ONE TPU process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp53_narrow_store.py
"""
import time

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from multirate_tpu.utils.metrics import (stream_copy_gbps,
                                             stream_expand_gbps)

    log("device:", jax.devices()[0].device_kind)
    rounds = {"copy": [], "exp_f32": [], "exp_bf16": [], "exp_int8": [],
              "copy_s8": []}
    # 32M-float inputs: every variant's input+output working set must
    # exceed the v5e's 128 MB VMEM or the probe measures VMEM (round-3
    # finding 1 — the first 8M attempt read 6.9 TB/s for bf16 stores)
    NF = 32_000_000
    for r in range(3):
        rounds["copy"].append(stream_copy_gbps())
        rounds["exp_f32"].append(
            stream_expand_gbps(n_floats=NF, out_dtype=jnp.float32))
        rounds["exp_bf16"].append(
            stream_expand_gbps(n_floats=NF, out_dtype=jnp.bfloat16))
        rounds["exp_int8"].append(
            stream_expand_gbps(n_floats=NF, out_dtype=jnp.int8))
        # same ELEMENT count as the f32 copy (1/4 the bytes): does an
        # int8-element stream sustain the same GB/s (VERDICT r5 item 6 —
        # is the int8 zc kernel's ceiling higher than the f32-measured
        # copy number implies)? 4x the elements so the byte-halved
        # working set still exceeds VMEM.
        rounds["copy_s8"].append(
            stream_copy_gbps(n_floats=4 * NF, dtype=jnp.int8))
        log(f"round {r}: " + "  ".join(
            f"{k}={v[-1]:.0f}GB/s" for k, v in rounds.items()))
    log("medians: " + "  ".join(
        f"{k}={np.median(v):.0f}" for k, v in rounds.items()))
    # effective INPUT-samples/s ceiling for a 1:4 interp at each store
    # width: n_in/s = BW / (4 + 4*osz) bytes per input
    for k, osz in (("exp_f32", 4), ("exp_bf16", 2), ("exp_int8", 1)):
        bw = np.median(rounds[k])
        log(f"  {k}: {bw:.0f} GB/s -> interp-4/1 input ceiling "
            f"{bw/(4 + 4*osz):.1f} Gsps")


if __name__ == "__main__":
    main()
