"""Marginal EC-add throughput inside a fori_loop (no per-add dispatch),
at several lane widths, plus the warmed dense-MSM pipeline at MSM_LOG2.

Usage: MSM_LOG2=18 ITERS=64 python tools/profile_ec_marginal.py
"""
import os
import sys
import time
import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *a, reps=3):
    out = fn(*a)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from snarkvm_tpu.ops import ec_pallas as ep

    iters = int(os.environ.get("ITERS", "64"))
    for width in (2048, 8192, 32768, 131072):
        ident = ep._identity_lm(width)

        def chain(x, y, z):
            def body(t, acc):
                out = ep.g1_add_traced(
                    {"X": acc[0], "Y": acc[1], "Z": acc[2]},
                    {"X": x, "Y": y, "Z": z})
                return (out["X"], out["Y"], out["Z"])
            return jax.lax.fori_loop(0, iters, body, (x, y, z))

        f = jax.jit(chain)
        dt, _ = timeit(f, ident["X"], ident["Y"], ident["Z"])
        rate = width * iters / dt / 1e6
        print(f"chain add  width={width:7d} iters={iters}: {dt*1e3:8.1f} ms"
              f"  ({rate:6.1f} M adds/s)", flush=True)

    # dense pipeline, warmed, at MSM_LOG2
    logn = int(os.environ.get("MSM_LOG2", "0"))
    if not logn:
        return
    from snarkvm_tpu.ops.msm import device_window
    from snarkvm_tpu.curves import sw_fast as g1f
    from snarkvm_tpu.params import bls12_377 as P

    n = 1 << logn
    rng = random.Random(9)
    base = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
    cycle, cur = [], base
    for _ in range(min(n, 256)):
        cycle.append(g1f.to_affine(cur))
        cur = g1f.jac_add(cur, g1f.jac_double(cur))
    pts = (cycle * ((n + len(cycle) - 1) // len(cycle)))[:n]
    scalars = [rng.randrange(P.R) for _ in range(n)]
    plm = ep.g1_from_affine_lm_fast(pts)
    sl = ep.scalars_to_limbs(scalars)
    B = plm["X"].shape[1]
    c = int(os.environ.get("MSM_C", "0")) or device_window(n)
    W = (253 + c - 1) // c
    nb = 1 << c
    nb_pad = max(128, ((nb + 127) // 128) * 128)
    print(f"n=2^{logn} c={c} W={W} nb={nb} lanes={W*nb_pad}", flush=True)

    # stage 1: dense schedule prep only (digits+sorts+gather), no EC
    dense = ep._msm_dense_raw(W, c, n, B, nb, nb_pad)
    # time the full fused pipeline warmed
    full = ep._msm_full_dense_fn(W, c, n, B, nb, nb_pad)
    t0 = time.perf_counter()
    out = full(plm["X"], plm["Y"], plm["Z"], sl)
    jax.block_until_ready(out)
    print(f"first call (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)
    dt, _ = timeit(full, plm["X"], plm["Y"], plm["Z"], sl, reps=2)
    print(f"full dense warm: {dt*1e3:8.1f} ms ({n/dt/1e6:.2f} Mpoint/s)",
          flush=True)


if __name__ == "__main__":
    main()
