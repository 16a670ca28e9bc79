"""Microbenchmark: 96-byte row gathers from a [B, 48] u16 HBM table.

Isolates the MSM v2 wall (SCALING.md: per-round gathers at ~3.3 GB/s):
which part is slow — the gather itself, the tile transposes, the
per-round dispatch overhead — and what the fastest XLA formulation is.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

LOG2 = int(os.environ.get("LOG2", "20"))
B = 1 << LOG2
ROWS_PER_ROUND = 45056
ROUNDS = int(os.environ.get("ROUNDS", "64"))   # subset of the 605

rng = np.random.default_rng(7)
tbl_u16 = jnp.asarray(rng.integers(0, 1 << 16, size=(B, 48), dtype=np.uint16))
tbl_u32 = jnp.asarray(np.ascontiguousarray(np.asarray(tbl_u16)).view(np.uint32))          # [B, 24]
idx = jnp.asarray(rng.integers(0, B, size=(ROUNDS, ROWS_PER_ROUND), dtype=np.int32))

total_rows = ROUNDS * ROWS_PER_ROUND
total_gb = total_rows * 96 / 1e9

def bench(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter(); o = f(*args); jax.block_until_ready(o)
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt*1e3:7.1f} ms  {total_gb/dt:6.2f} GB/s", flush=True)
    return dt

# 1. per-round loop: take + 2 transposes + xor (current pipeline shape)
ntiles = ROWS_PER_ROUND // 128
def per_round_full(tbl, idx):
    def body(t, acc):
        rows = jnp.take(tbl, idx[t], axis=0)
        xyt = jnp.transpose(rows.reshape(ntiles, 128, 48).astype(jnp.uint32), (0, 2, 1))
        xyt = jnp.transpose(xyt, (1, 0, 2)).reshape(48, ROWS_PER_ROUND)
        return acc ^ xyt
    return jax.lax.fori_loop(0, ROUNDS, body, jnp.zeros((48, ROWS_PER_ROUND), jnp.uint32))
bench("per-round take+transpose+xor (current)", per_round_full, tbl_u16, idx)

# 2. per-round take only (no transpose)
def per_round_take(tbl, idx):
    def body(t, acc):
        rows = jnp.take(tbl, idx[t], axis=0)
        return acc ^ rows.astype(jnp.uint32).sum(axis=0, dtype=jnp.uint32)[None].repeat(1, 0) if False else acc ^ jnp.zeros((), jnp.uint32) + acc
    # simpler: xor-fold rows into [rows,48] acc
    def body2(t, acc):
        rows = jnp.take(tbl, idx[t], axis=0)
        return acc ^ rows
    return jax.lax.fori_loop(0, ROUNDS, body2, jnp.zeros((ROWS_PER_ROUND, 48), jnp.uint16))
bench("per-round take only (u16 [B,48])", per_round_take, tbl_u16, idx)

# 3. per-round take of u32 [B,24]
def per_round_take32(tbl, idx):
    def body(t, acc):
        rows = jnp.take(tbl, idx[t], axis=0)
        return acc ^ rows
    return jax.lax.fori_loop(0, ROUNDS, body, jnp.zeros((ROWS_PER_ROUND, 24), jnp.uint32))
bench("per-round take only (u32 [B,24])", per_round_take32, tbl_u32, idx)

# 4. ONE big take (all rounds at once)
def big_take(tbl, idx):
    return jnp.take(tbl, idx.reshape(-1), axis=0)
bench("one big take (u16)", big_take, tbl_u16, idx)
bench("one big take (u32)", big_take, tbl_u32, idx)

# 5. transpose-only (data already gathered)
rows_all = jnp.take(tbl_u16, idx[0], axis=0)
def transpose_only(rows):
    xyt = jnp.transpose(rows.reshape(ntiles, 128, 48).astype(jnp.uint32), (0, 2, 1))
    return jnp.transpose(xyt, (1, 0, 2)).reshape(48, ROWS_PER_ROUND)
f = jax.jit(transpose_only)
o = f(rows_all); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(ROUNDS):
    o = f(rows_all)
jax.block_until_ready(o)
dt = time.perf_counter() - t0
print(f"{'transpose-only xROUNDS (dispatched)':44s} {dt*1e3:7.1f} ms  {total_gb/dt:6.2f} GB/s", flush=True)

# 6. gather via one-hot matmul?? [rows, B] x [B, 48] — B too big. skip.

# 7. take_along_axis formulation
def taa(tbl, idx):
    return jnp.take_along_axis(tbl, idx.reshape(-1)[:, None], axis=0)
bench("take_along_axis (u16, broadcast dim)", taa, tbl_u16, idx)

# 8. monotonic gather: sorted indices (locality test)
idx_sorted = jnp.sort(idx.reshape(-1)).reshape(ROUNDS, ROWS_PER_ROUND)
bench("one big take, SORTED indices (u16)", big_take, tbl_u16, idx_sorted)

# 9. dynamic-slice streaming baseline: sequential slabs (DMA speed-of-light)
def slab_read(tbl):
    nslab = total_rows // 4096
    def body(t, acc):
        s = jax.lax.dynamic_slice(tbl, ((t % (B // 4096)) * 4096, 0), (4096, 48))
        return acc ^ s
    return jax.lax.fori_loop(0, nslab, body, jnp.zeros((4096, 48), jnp.uint16))
bench("sequential 4096-row slabs (stream SOL)", slab_read, tbl_u16)
