"""Gather-strategy micro-bench for the MSM accumulation loop.

Compares, inside ONE jit (marginal slope):
  a) limb-major gather: take([24, B] u32, idx, axis=1)  x3 coords
  b) row-major gather + transpose: take([B, 24], idx, axis=0).T x3
  c) row-major gather, no transpose (lower bound)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def slope(fn, args, k_lo=2, k_hi=10):
    def chain(k):
        @jax.jit
        def run(*a):
            def body(t, s):
                return fn(t, *a)
            # fold over k iterations; fn returns pytree state-independent
            out = None
            for t in range(k):
                out = fn(t, *a)
            return out
        return run

    lo_f, hi_f = chain(k_lo), chain(k_hi)
    jax.block_until_ready(lo_f(*args)); jax.block_until_ready(hi_f(*args))
    def t(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi_f) - t(lo_f)) / (k_hi - k_lo)


def main():
    B = int(os.environ.get("B", str(1 << 16)))
    lanes = int(os.environ.get("LANES", "26624"))
    L = 24
    rng = np.random.default_rng(0)
    lm = [jnp.asarray(rng.integers(0, 1 << 16, (L, B), dtype=np.uint32))
          for _ in range(3)]
    rm = [jnp.asarray(np.ascontiguousarray(np.asarray(x).T)) for x in lm]
    idx0 = jnp.asarray(rng.integers(0, B, lanes, dtype=np.int32))

    def lm_gather(t, x0, x1, x2, idx):
        i = (idx + t) % B
        return tuple(jnp.take(x, i, axis=1) for x in (x0, x1, x2))

    def rm_gather_T(t, x0, x1, x2, idx):
        i = (idx + t) % B
        return tuple(jnp.take(x, i, axis=0).T for x in (x0, x1, x2))

    def rm_gather(t, x0, x1, x2, idx):
        i = (idx + t) % B
        return tuple(jnp.take(x, i, axis=0) for x in (x0, x1, x2))

    for name, fn, xs in (("limb-major axis1", lm_gather, lm),
                         ("row-major axis0 +T", rm_gather_T, rm),
                         ("row-major axis0", rm_gather, rm)):
        dt = slope(fn, (*xs, idx0))
        print(f"{name:20s}: {dt*1e3:8.3f} ms per 3-coord gather of "
              f"{lanes} lanes", flush=True)


if __name__ == "__main__":
    main()
