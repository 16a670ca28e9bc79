import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
import numpy as np
import jax, jax.numpy as jnp
from snarkvm_tpu.ops import msm_v2 as m2
from snarkvm_tpu.ops import ec_pallas as ep
from snarkvm_tpu.curves import sw_fast as g1f
from snarkvm_tpu.params import bls12_377 as P

n = 1 << int(os.environ.get("LOG2", "20"))
base = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
cycle, cur = [], base
for _ in range(256):
    cycle.append(g1f.to_affine(cur)); cur = g1f.jac_add(cur, g1f.jac_double(cur))
tbl256, _ = m2.pack_points_u16(cycle)
reps = (n + 255) // 256
tbl = jnp.asarray(np.tile(np.asarray(tbl256), (reps, 1))[:n])
rng_np = np.random.default_rng(9)
sl = rng_np.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
sl[:, 15] &= 0x0FFF
sl = jnp.asarray(sl)

from snarkvm_tpu.ops.msm_v2 import Geometry, _schedule_light, _acc_round
c = None
# replicate msm_g1_v2's window choice
from snarkvm_tpu.ops import msm as msm_mod
c = msm_mod.device_window(n) if c is None else c
geo = Geometry(n, c)
print(f"n=2^{n.bit_length()-1} c={c} W={geo.W} lanes={geo.lanes} cap={geo.cap}", flush=True)

sched = jax.jit(lambda s: _schedule_light(geo, s))
out = sched(sl); jax.block_until_ready(out)
t0 = time.perf_counter(); out = sched(sl); jax.block_until_ready(out)
t_sched = time.perf_counter() - t0
print(f"schedule: {t_sched*1e3:.0f} ms (tmax={int(out[4])})", flush=True)

spay, base_l, end_l, R_l, tmax, dropped = out
lanes, ntiles = geo.lanes, geo.lanes // 128

def accum(table_u16, spay, base_l, end_l, R_l, tmax):
    ident = ep._identity_lm(lanes)
    def body(t, acc3):
        pos = base_l + t * R_l
        valid = pos < end_l
        src = jnp.take(spay, jnp.where(valid, pos, 0))
        pt_idx = src & ((1 << 30) - 1)
        neg = (src >> 30) & 1
        rows = jnp.take(table_u16, pt_idx, axis=0)
        xyt = jnp.transpose(rows.reshape(ntiles, 128, 48).astype(jnp.uint32), (0, 2, 1))
        xyt = jnp.transpose(xyt, (1, 0, 2)).reshape(48, lanes)
        mt = (valid.astype(jnp.int32) | (neg << 1)).reshape(1, lanes)
        acc = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}
        o = m2._acc_round(acc, xyt, mt)
        return (o["X"], o["Y"], o["Z"])
    acc3 = jax.lax.fori_loop(0, tmax, body, (ident["X"], ident["Y"], ident["Z"]))
    return acc3

accj = jax.jit(accum)
a = accj(tbl, spay, base_l, end_l, R_l, tmax); jax.block_until_ready(a)
t0 = time.perf_counter(); a = accj(tbl, spay, base_l, end_l, R_l, tmax); jax.block_until_ready(a)
t_acc = time.perf_counter() - t0
print(f"accumulation ({int(tmax)} rounds): {t_acc*1e3:.0f} ms", flush=True)

# gather-only variant: same loop, no EC math (xor-fold the rows into acc)
def gather_only(table_u16, spay, base_l, end_l, R_l, tmax):
    def body(t, acc):
        pos = base_l + t * R_l
        valid = pos < end_l
        src = jnp.take(spay, jnp.where(valid, pos, 0))
        pt_idx = src & ((1 << 30) - 1)
        rows = jnp.take(table_u16, pt_idx, axis=0)
        xyt = jnp.transpose(rows.reshape(ntiles, 128, 48).astype(jnp.uint32), (0, 2, 1))
        xyt = jnp.transpose(xyt, (1, 0, 2)).reshape(48, lanes)
        return acc ^ xyt
    return jax.lax.fori_loop(0, tmax, body, jnp.zeros((48, lanes), jnp.uint32))

gj = jax.jit(gather_only)
g = gj(tbl, spay, base_l, end_l, R_l, tmax); jax.block_until_ready(g)
t0 = time.perf_counter(); g = gj(tbl, spay, base_l, end_l, R_l, tmax); jax.block_until_ready(g)
print(f"gather-only ({int(tmax)} rounds): {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

# sort-only cost at this n (the schedule's n*W-scaling component)
W = geo.W
def sort_only(s):
    mag, sign = m2.signed_digits(s, geo.c, W)
    bucket = mag - 1
    key = (jnp.arange(W, dtype=jnp.int32)[:, None] * (geo.nb + 1)
           + jnp.where(bucket < 0, geo.nb, bucket))
    payload = (jnp.arange(n, dtype=jnp.int32)[None, :]
               | (sign.astype(jnp.int32) << 30))
    skey, spay = jax.lax.sort((key.reshape(W * n), payload.reshape(W * n)),
                              dimension=0, num_keys=1)
    return skey[0], spay[0]
sj = jax.jit(sort_only)
r = sj(sl); jax.block_until_ready(r)
t0 = time.perf_counter(); r = sj(sl); jax.block_until_ready(r)
print(f"recode+sort only: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

# reduction phase timing: feed the accumulator output through the
# planned fold/scan/tree steps (the _msm_v2_raw reduction block)
from snarkvm_tpu.ops.msm_v2 import _g1_add_lazy
import numpy as _np
nb_v, lanes = geo.nb_v, geo.lanes
off = _np.arange(lanes) % nb_v
w_of = _np.arange(lanes) // nb_v
nb_l = _np.asarray(geo.nb_ws, _np.int32)[w_of]
steps_list, masks_list = [], []
for nb_w, R_w in sorted(set(zip(geo.nb_ws, geo.R_ws))):
    in_class = nb_l == nb_w
    r = R_w
    while r > 1:
        half = r // 2
        steps_list.append(half * nb_w); masks_list.append(in_class & (off < half * nb_w))
        r = half
live = off < nb_l
step = 1
while step < geo.nb:
    steps_list.append(step); masks_list.append((off + step < nb_l) & live)
    step *= 2
step = 1
while step < geo.nb:
    steps_list.append(step); masks_list.append((off % (2 * step) == 0) & (off + step < nb_l))
    step *= 2
print(f"reduction steps: {len(steps_list)}", flush=True)
steps_arr = jnp.asarray(_np.array(steps_list, _np.int32))
masks_arr = jnp.asarray(_np.stack(masks_list))

def reduce_only(ax, ay, az):
    def red_body(i, acc3):
        acc_d = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}
        stp = steps_arr[i]
        keep = masks_arr[i]
        shifted = {k: jnp.roll(v, -stp, axis=1) for k, v in acc_d.items()}
        shifted = ep._mask_identity(shifted, keep)
        o = _g1_add_lazy(acc_d, shifted)
        return (o["X"], o["Y"], o["Z"])
    return jax.lax.fori_loop(0, len(steps_list), red_body, (ax, ay, az))

rj = jax.jit(reduce_only)
r2 = rj(*a); jax.block_until_ready(r2)
t0 = time.perf_counter(); r2 = rj(*a); jax.block_until_ready(r2)
print(f"reduction: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

# end-to-end msm_g1_v2 in this same process, phase-subtracted
t0 = time.perf_counter()
out = m2.msm_g1_v2(tbl, sl, n)
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
out = m2.msm_g1_v2(tbl, sl, n)
t_e2e = time.perf_counter() - t0
print(f"msm_g1_v2 end-to-end: first {t_first:.2f}s, warm {t_e2e*1e3:.0f} ms", flush=True)

# split the production c=13 path: fused device jit vs host tail
B = tbl.shape[0]
geo2 = m2.Geometry(n, 13)
print(f"prod geometry: c=13 W={geo2.W} lanes={geo2.lanes} cap={geo2.cap}", flush=True)
raw = jax.jit(m2._msm_v2_raw(geo2, B))
o = raw(tbl, sl); jax.block_until_ready(o[:3])
t0 = time.perf_counter(); o = raw(tbl, sl); jax.block_until_ready(o[:3])
t_raw = time.perf_counter() - t0
print(f"fused device jit (c=13): {t_raw*1e3:.0f} ms", flush=True)
t0 = time.perf_counter()
sums = {"X": o[0], "Y": o[1], "Z": o[2]}
jacs = m2._lm_proj_to_jac_ints(sums)[:geo2.W]
res = m2._combine(jacs, 13)
print(f"host tail (extract+combine): {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
