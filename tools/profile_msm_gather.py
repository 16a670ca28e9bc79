import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

# isolate the per-round gather+transpose variants at the real shapes
lanes, B, rounds = 45056, 1 << 20, 605
ntiles = lanes // 128
rng = np.random.default_rng(0)
tbl16 = jnp.asarray(rng.integers(0, 65536, size=(B, 48), dtype=np.uint16))
tbl32 = jnp.asarray(rng.integers(0, 1 << 31, size=(B, 24), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, B, size=(lanes,), dtype=np.int32))

def timed(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter(); o = f(*args); jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

def loop(body, init):
    def run(tbl, idx):
        return jax.lax.fori_loop(0, rounds, lambda t, acc: body(tbl, idx, t, acc), init)
    return run

# (a) u16 row gather only
timed("take u16 rows only", loop(
    lambda tbl, idx, t, acc: acc ^ jnp.take(tbl, (idx + t) % B, axis=0).astype(jnp.uint32),
    jnp.zeros((lanes, 48), jnp.uint32)), tbl16, idx)
# (b) u32 row gather only (24 cols)
timed("take u32 rows only", loop(
    lambda tbl, idx, t, acc: acc ^ jnp.take(tbl, (idx + t) % B, axis=0),
    jnp.zeros((lanes, 24), jnp.uint32)), tbl32, idx)
# (c) u16 gather + both tile transposes (the production path)
def c_body(tbl, idx, t, acc):
    rows = jnp.take(tbl, (idx + t) % B, axis=0)
    xyt = jnp.transpose(rows.reshape(ntiles, 128, 48).astype(jnp.uint32), (0, 2, 1))
    xyt = jnp.transpose(xyt, (1, 0, 2)).reshape(48, lanes)
    return acc ^ xyt
timed("take u16 + transposes", c_body and loop(c_body, jnp.zeros((48, lanes), jnp.uint32)), tbl16, idx)
# (d) sequential rows (no randomness): upper bound of take throughput
timed("take u16 sequential", loop(
    lambda tbl, idx, t, acc: acc ^ jnp.take(tbl, (jnp.arange(lanes) + t * lanes) % B, axis=0).astype(jnp.uint32),
    jnp.zeros((lanes, 48), jnp.uint32)), tbl16, idx)
# (e) dynamic-slice rows (contiguous): DMA-speed reference
timed("dynamic_slice rows", loop(
    lambda tbl, idx, t, acc: acc ^ jax.lax.dynamic_slice(tbl, ((t * 131) % (B - lanes), 0), (lanes, 48)).astype(jnp.uint32),
    jnp.zeros((lanes, 48), jnp.uint32)), tbl16, idx)
