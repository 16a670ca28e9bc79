"""Gather layout sweep with forced materialization: the take feeds an
in-jit reduction so XLA cannot elide it, and the tiny output removes the
2GB result-write from the timing. Run on the real chip."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

B = 1 << 20
N = 1 << 22
rng = np.random.default_rng(7)
idx = jnp.asarray(rng.integers(0, B, size=(N,), dtype=np.int32))

def bench(name, fn, *args, bytes_moved=None, reps=1):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / reps
    gbs = (bytes_moved or 1) / dt / 1e9
    print(f"{name:46s} {dt*1e3:7.1f} ms  {gbs:7.2f} GB/s", flush=True)
    return dt

def take_red(tbl, idx):
    rows = jnp.take(tbl, idx, axis=0)
    return rows.astype(jnp.uint32).sum() if rows.dtype != jnp.float32 \
        else rows.sum()

for width, dt_ in [(24, np.uint32), (32, np.uint32), (64, np.uint32),
                   (128, np.uint32), (48, np.uint16), (96, np.uint16),
                   (128, np.float32), (32, np.float32), (8, np.uint32)]:
    tbl = jnp.asarray(rng.integers(0, 100, size=(B, width)).astype(dt_))
    nbytes = N * width * np.dtype(dt_).itemsize
    bench(f"take+sum [{width}] {np.dtype(dt_).name}", take_red, tbl, idx,
          bytes_moved=nbytes)

# stream SOL: sum a 256MB array
big = jnp.asarray(rng.integers(0, 100, size=(1 << 26,), dtype=np.uint32))
bench("stream sum 256MB u32", lambda x: x.sum(), big,
      bytes_moved=(1 << 28), reps=3)

# gather then write full output (the pipeline also writes)
def take_out(tbl, idx):
    return jnp.take(tbl, idx, axis=0) ^ jnp.uint32(1)
tbl32 = jnp.asarray(rng.integers(0, 100, size=(B, 32), dtype=np.uint32))
bench("take+write [32] u32", take_out, tbl32, idx, bytes_moved=2 * N * 128)
tbl128 = jnp.asarray(rng.integers(0, 100, size=(B, 128), dtype=np.uint32))
bench("take+write [128] u32", take_out, tbl128, idx, bytes_moved=2 * N * 512)
