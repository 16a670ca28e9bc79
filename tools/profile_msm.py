"""Profile the TPU MSM pipeline stage by stage (prep / accum / suffix).

Usage: MSM_LOG2=16 python tools/profile_msm.py
Also times a raw 1M-lane gather and a raw EC add at the accum width to
locate the bottleneck.
"""
import os
import sys
import time
import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def t(fn, *a):
    out = fn(*a)
    jax.tree_util.tree_map(lambda x: x.block_until_ready()
                           if hasattr(x, "block_until_ready") else x, out)
    t0 = time.perf_counter()
    out = fn(*a)
    jax.tree_util.tree_map(lambda x: x.block_until_ready()
                           if hasattr(x, "block_until_ready") else x, out)
    return time.perf_counter() - t0, out


def main():
    from snarkvm_tpu.ops import ec_pallas as ep
    from snarkvm_tpu.ops.msm import device_window as default_window
    from snarkvm_tpu.curves import sw_fast as g1f
    from snarkvm_tpu.params import bls12_377 as P

    logn = int(os.environ.get("MSM_LOG2", "16"))
    n = 1 << logn
    rng = random.Random(9)
    base = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
    cycle, cur = [], base
    for _ in range(min(n, 256)):
        cycle.append(g1f.to_affine(cur))
        cur = g1f.jac_add(cur, g1f.jac_double(cur))
    pts = (cycle * ((n + len(cycle) - 1) // len(cycle)))[:n]
    scalars = [rng.randrange(P.R) for _ in range(n)]
    t0 = time.perf_counter()
    plm = ep.g1_from_affine_lm_fast(pts)
    sl = ep.scalars_to_limbs(scalars)
    print(f"setup pack: {time.perf_counter()-t0:.2f}s", flush=True)

    B = plm["X"].shape[1]
    c = default_window(n)
    W = (253 + c - 1) // c
    nb = 1 << c
    nb_pad = max(128, ((nb + 127) // 128) * 128)
    lanes = W * nb_pad
    print(f"n=2^{logn} c={c} W={W} nb={nb} nb_pad={nb_pad} lanes={lanes}",
          flush=True)

    prep = ep._msm_prep_fn(W, c, n, B, nb, nb_pad)
    dt, (order, startp, countsp, rounds) = t(prep, sl)
    print(f"prep(sort):  {dt*1e3:8.1f} ms  rounds={int(np.asarray(rounds))}",
          flush=True)

    accum = ep._msm_accum_fn(W, nb, nb_pad, B, c)
    dt, acc = t(accum, plm["X"], plm["Y"], plm["Z"],
                order, startp, countsp, rounds)
    print(f"accum:       {dt*1e3:8.1f} ms", flush=True)

    suffix = ep._msm_suffix_fn(W, nb, nb_pad)
    dt, sums = t(suffix, *acc)
    print(f"suffix:      {dt*1e3:8.1f} ms", flush=True)

    # micro: one EC add at the accum width
    ident = ep._identity_lm(lanes)
    add = jax.jit(lambda a, b: ep.g1_add_traced(
        {"X": a[0], "Y": a[1], "Z": a[2]},
        {"X": b[0], "Y": b[1], "Z": b[2]}))
    args = ((ident["X"], ident["Y"], ident["Z"]),
            (ident["X"], ident["Y"], ident["Z"]))
    dt, _ = t(add, *args)
    print(f"1 EC add @ {lanes} lanes: {dt*1e3:8.2f} ms "
          f"({lanes/dt/1e6:.1f} M adds/s)", flush=True)

    # micro: one gather of lanes indices from the point plane
    idx = jnp.asarray(np.random.randint(0, B, size=lanes, dtype=np.int32))
    gat = jax.jit(lambda v, i: (jnp.take(v[0], i, axis=1),
                                jnp.take(v[1], i, axis=1),
                                jnp.take(v[2], i, axis=1)))
    dt, _ = t(gat, (plm["X"], plm["Y"], plm["Z"]), idx)
    print(f"1 gather of {lanes} lanes from B={B}: {dt*1e3:8.2f} ms", flush=True)

    # end-to-end
    t0 = time.perf_counter()
    res = ep.msm_g1_lm(plm, sl, n)
    dt = time.perf_counter() - t0
    print(f"end-to-end msm_g1_lm: {dt:.3f}s ({n/dt/1e6:.3f} Mpoint/s)",
          flush=True)


if __name__ == "__main__":
    main()
