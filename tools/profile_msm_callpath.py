import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from snarkvm_tpu.ops import msm_v2 as m2
from snarkvm_tpu.curves import sw_fast as g1f
from snarkvm_tpu.params import bls12_377 as P

n = 1 << 20
base = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
cycle, cur = [], base
for _ in range(256):
    cycle.append(g1f.to_affine(cur)); cur = g1f.jac_add(cur, g1f.jac_double(cur))
tbl256, _ = m2.pack_points_u16(cycle)
tbl = jnp.asarray(np.tile(np.asarray(tbl256), ((n + 255)//256, 1))[:n])
rng_np = np.random.default_rng(9)
sl = rng_np.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
sl[:, 15] &= 0x0FFF
sl = jnp.asarray(sl)

# monkeypatch timers around the internal pieces
orig_fn = m2._msm_v2_fn
def traced_fn(n_, c_, B_, cap_):
    geo, run = orig_fn(n_, c_, B_, cap_)
    def timed_run(t, s):
        t0 = time.perf_counter()
        out = run(t, s)
        print(f"  inner run: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
        return out
    return geo, timed_run
m2._msm_v2_fn = traced_fn

for i in range(3):
    t0 = time.perf_counter()
    r = m2.msm_g1_v2(tbl, sl, n)
    print(f"call {i}: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
