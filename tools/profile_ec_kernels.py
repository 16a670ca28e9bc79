"""Honest EC-add kernel throughput: k adds chained inside ONE jit
(marginal slope between k_lo and k_hi removes dispatch latency).

Usage: python tools/profile_ec_kernels.py [lanes]
Sweeps kernel flavor x block size on the current backend.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    from snarkvm_tpu.ops import ec_pallas as ep
    from snarkvm_tpu.curves import sw_fast as g1f
    from snarkvm_tpu.params import bls12_377 as P

    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    L = ep.L

    base = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
    pts, cur = [], base
    for _ in range(256):
        pts.append(g1f.to_affine(cur))
        cur = g1f.jac_add(cur, g1f.jac_double(cur))
    plm = ep.g1_from_affine_lm_fast((pts * ((lanes + 255) // 256))[:lanes])
    pp, nn = ep._p_plane(lanes), ep._n_plane(lanes)

    kernels = {
        "rcb_cios": ep._add_kernel_rcb_cios,
        "rcb_mm2": ep._add_kernel_rcb_mm2,
        "rcb_fw": ep._add_kernel_rcb,
    }

    def chained(kernel, block, k):
        bs = lambda: pl.BlockSpec((L, block), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)

        def one(x, y, z):
            return pl.pallas_call(
                kernel,
                grid=(lanes // block,),
                in_specs=[bs() for _ in range(8)],
                out_specs=(bs(), bs(), bs()),
                out_shape=tuple(jax.ShapeDtypeStruct((L, lanes), jnp.uint32)
                                for _ in range(3)),
            )(x, y, z, plm["X"], plm["Y"], plm["Z"], pp, nn)

        @jax.jit
        def run(x, y, z):
            def body(_, s):
                return one(*s)
            return jax.lax.fori_loop(0, k, body, (x, y, z))

        return run

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    args = (plm["X"], plm["Y"], plm["Z"])
    for name, kern in kernels.items():
        for block in (512, 1024, 2048):
            if lanes % block:
                continue
            try:
                lo = timeit(chained(kern, block, 2), *args)
                hi = timeit(chained(kern, block, 10), *args)
                dt = (hi - lo) / 8
                print(f"{name:10s} block={block:5d}: {dt*1e3:8.3f} ms/add "
                      f"({lanes/dt/1e6:7.1f} M adds/s)", flush=True)
            except Exception as e:
                print(f"{name:10s} block={block:5d}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
