"""Raw VPU/MXU primitive throughput on the current backend via Pallas.

Each case runs a kernel over a [8, 512] (or [128,128] for dots) block grid
with an in-kernel fori_loop of ITERS dependent ops, so dispatch and HBM
traffic amortize away. Reports Gops/s (per element-op).

Usage: python tools/profile_vpu.py
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 512
ROWS, COLS = 32, 512          # one VMEM block per grid step
GRID = 64                     # grid steps (amortize)


def sync(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def bench(name, kernel, dtype, ops_per_iter, rows=ROWS, cols=COLS,
          grid=GRID, iters=ITERS):
    x = jnp.asarray(np.random.randint(1, 7, size=(rows, cols * grid)).astype(dtype))

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((rows, cols), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, cols), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, cols * grid), dtype),
        )(x)

    f = jax.jit(run)
    sync(f(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    total = rows * cols * grid * iters * ops_per_iter
    print(f"{name:28s}: {best*1e3:8.2f} ms  ({total/best/1e9:8.1f} Gop/s)",
          flush=True)


def k_u32_add(x_ref, o_ref):
    x = x_ref[:, :]
    def body(t, a):
        return a + x
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, x)


def k_u32_mul(x_ref, o_ref):
    x = x_ref[:, :]
    def body(t, a):
        return a * x
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, x)


def k_u32_mulmaskshift(x_ref, o_ref):
    x = x_ref[:, :]
    def body(t, a):
        p = a * x
        return (p & jnp.uint32(0xFFFF)) + (p >> 16)
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, x)


def k_u32_shift(x_ref, o_ref):
    x = x_ref[:, :]
    def body(t, a):
        return (a >> 1) + x
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, x)


def k_f32_mul(x_ref, o_ref):
    x = x_ref[:, :]
    def body(t, a):
        return a * x
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, x)


def k_f32_fma(x_ref, o_ref):
    x = x_ref[:, :]
    def body(t, a):
        return a * x + x
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, x)


def k_u16_mul(x_ref, o_ref):
    x = x_ref[:, :]
    def body(t, a):
        return a * x
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, x)


def k_where(x_ref, o_ref):
    x = x_ref[:, :]
    def body(t, a):
        return jnp.where(a > x, a, x) + x
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, x)


def k_dot_bf16(x_ref, o_ref):
    x = x_ref[:, :]
    def body(t, a):
        return jax.lax.dot(a, x, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS // 8, body, x)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    bench("u32 add", k_u32_add, np.uint32, 1)
    bench("u32 mul", k_u32_mul, np.uint32, 1)
    bench("u32 mul+mask+shift+add", k_u32_mulmaskshift, np.uint32, 4)
    bench("u32 shift+add", k_u32_shift, np.uint32, 2)
    bench("f32 mul", k_f32_mul, np.float32, 1)
    bench("f32 fma", k_f32_fma, np.float32, 1)
    bench("u16 mul (int16)", k_u16_mul, np.uint16, 1)
    bench("select(where)+add", k_where, np.uint32, 2)
    # MXU: [128,128]@[128,128] bf16 dots, chained
    bench("bf16 128x128 dot (MACs)", k_dot_bf16, "bfloat16", 128 * ITERS // 8 // ITERS,
          rows=128, cols=128, grid=8)


if __name__ == "__main__":
    main()
