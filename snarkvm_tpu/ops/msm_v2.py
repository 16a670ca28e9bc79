"""MSM v2 — the TPU Pippenger pipeline built around measured v5e costs.

Replaces algorithms/src/msm/variable_base/batched.rs:366 (reference CPU
batch-affine Pippenger) and algorithms/cuda (sppark MSM) for the device
path. Design drivers, all MEASURED on v5e (see SCALING.md):

  * row gathers cost ~18ns/byte regardless of locality — so the point
    table is u16 row-major [B, 48] (affine X||Y, 96B rows) and every
    point row is moved exactly once per (window, point) into schedule
    order; the limb-major [L, B] gather XLA emits for jnp.take(axis=1)
    is 30x slower and is never used.
  * monolithic transposes of tall-thin arrays are pathological (2.7s
    for 1.9GB) but BATCHED tile transposes [T,128,48]->[T,48,128] run
    at memory speed (35ms) — the schedule materializes tiles and the
    EC kernel consumes [48,128] point tiles directly.
  * XLA sort of ~20M int32 keys is ~140ms — affordable ONCE; per-element
    gathers of int32 are ~170ms each — so the schedule does ONE sort and
    derives every index ELEMENTWISE from small per-(window,bucket)
    arrays: replica assignment is `sorted_position mod R` (round-robin
    by construction, no rank computation), and the materialization index
    of (round t, lane) is start[bucket] + r0 + t*R.
  * the EC add kernel (ops/ec_pallas rcb13: 13-bit limbs, lazy
    reduction) runs ~79M adds/s; the mixed variant here (affine second
    operand, 11 muls) is used for bucket accumulation.

Pipeline (one jit):
  1. signed digit recode: c-bit windows, digits in [-(2^(c-1)-1), 2^(c-1)],
     buckets = |digit| - 1, nb = 2^(c-1) buckets per full window
     (halves the bucket count vs unsigned — reference uses unsigned
     c = ln(n)+2, batched.rs:390).
  2. ONE global sort of (window*(nb+1) + bucket, point_idx | sign<<30).
  3. per-(window,bucket) run starts via searchsorted (small).
  4. virtual buckets: bucket b of window w spreads over R_w replica
     lanes (interleaved layout rep*nb_w + b so replica folds are
     contiguous halves); replica of an element = sorted position mod R.
  5. materialization: slot (t, lane) reads sorted payload at
     start[b] + r0(lane) + t*R — elementwise — then gathers the u16
     point row and tile-transposes. Sign and validity ride a meta plane.
  6. accumulation: fori over `cap` rounds; each round is one Pallas
     mixed-add over all W*nb_v lanes (static shapes, one kernel).
  7. replica fold (contiguous halves) + weighted-tree bucket reduction
     (T = sum (j+1)*S_j via (T,S) pair tree: O(nb) EC work instead of
     the O(nb log nb) Hillis-Steele scan).
  8. window sums -> host Horner combine (tiny).

Correctness: bit-identical group results vs the host integer MSM
(tests/test_msm_v2.py); representatives are non-canonical (lazy
reduction + projective scaling) and are reduced mod p on extraction.
"""
from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limb import FQ
from ..params import bls12_377 as P
from . import ec_pallas as ep
from .ec_pallas import (L, _mm13, _mm13_rolled, _add13, _sub13, _sub13_32,
                        _to13, _from13, L13, W13, MASK13)

LANE = 128
NUM_BITS = 253

# The point TABLE is stored in R13-Montgomery form (factor 2^390, the
# 13-bit kernel's natural R) — NOT the pipeline-wide 2^384. With table
# factor exactly R13, every term of the mixed add is uniform in the
# accumulator's factor F1 (e.g. t4 = Y2*Z1*F1*(R13/R13) + Y1*F1), so the
# accumulator may carry ANY per-lane factor: a uniform projective scale
# of (X:Y:Z) is the same group element and survives the proj->jacobian
# extraction as a lambda-scaling.
_R13_MONT = pow(2, W13 * L13, P.Q)


# ---------------------------------------------------------------------------
# Point table (u16 row-major, affine, Montgomery form)
# ---------------------------------------------------------------------------

def pack_points_u16(points, pad_to: int | None = None):
    """points: list of (x, y) canonical affine ints or None (identity).
    Returns ([B, 48] u16 table, identity mask [B] bool). Rows are
    (X*2^390 mod p || Y*2^390 mod p) as 24+24 little-endian 16-bit limbs
    (R13-Montgomery — see _R13_MONT note above)."""
    n = len(points)
    B = pad_to or max(LANE, ((n + LANE - 1) // LANE) * LANE)
    buf = bytearray()
    ident = np.zeros(B, dtype=bool)
    zero96 = bytes(96)
    for i, pt in enumerate(points):
        if pt is None:
            buf += zero96
            ident[i] = True
        else:
            buf += (pt[0] * _R13_MONT % P.Q).to_bytes(48, "little")
            buf += (pt[1] * _R13_MONT % P.Q).to_bytes(48, "little")
    if B > n:
        buf += zero96 * (B - n)
        ident[n:] = True
    arr = np.frombuffer(bytes(buf), dtype=np.uint16).reshape(B, 48)
    return jnp.asarray(arr), ident


def plm_to_table_u16(plm, ident_lanes=None):
    """Convert an existing limb-major projective dict (Z must be 0 or the
    Montgomery one — i.e. affine points as produced by g1_from_affine_lm*,
    with the pipeline-wide 2^384 factor) to the [B, 48] u16 R13-Montgomery
    row table. Host-side (np): rescales each coordinate by 2^6 mod p."""
    X = np.asarray(plm["X"])
    Y = np.asarray(plm["Y"])
    Z = np.asarray(plm["Z"])
    ident = ~np.any(Z != 0, axis=0)
    B = X.shape[1]
    scale = _R13_MONT * pow(FQ.R, -1, P.Q) % P.Q      # 2^6 mod p
    tbl = np.zeros((B, 48), np.uint16)
    for i in range(B):
        if ident[i]:
            continue
        x = ep._col_to_int(X[:, i]) * scale % P.Q
        y = ep._col_to_int(Y[:, i]) * scale % P.Q
        tbl[i, :24] = np.frombuffer(x.to_bytes(48, "little"), np.uint16)
        tbl[i, 24:] = np.frombuffer(y.to_bytes(48, "little"), np.uint16)
    return jnp.asarray(tbl), ident


# ---------------------------------------------------------------------------
# Signed digit recode
# ---------------------------------------------------------------------------

def _extract_unsigned(slimbs, w, c):
    """c-bit window w of [n, 16]x16-bit scalar limbs -> [n] int32."""
    lo = w * c
    i0 = lo // 16
    sh = lo % 16
    acc = slimbs[:, i0] >> sh
    got = 16 - sh
    j = i0 + 1
    while got < c and j < 16:
        acc = acc | (slimbs[:, j] << got)
        got += 16
        j += 1
    return (acc & np.uint32((1 << c) - 1)).astype(jnp.int32)


def signed_digits(slimbs, c, W):
    """Returns (mag [W, n] int32 in [0, 2^(c-1)], sign [W, n] bool).
    digit = (-1)^sign * mag; scalar = sum digit_w 2^(cw). mag 0 = skip."""
    half = 1 << (c - 1)
    mags, signs = [], []
    carry = jnp.zeros(slimbs.shape[0], jnp.int32)
    for w in range(W):
        d = _extract_unsigned(slimbs, w, c) + carry
        # d in [0, 2^c]; if d > half: digit = d - 2^c (negative), carry 1
        neg = d > half
        carry = neg.astype(jnp.int32)
        mag = jnp.where(neg, (1 << c) - d, d)
        mags.append(mag)
        signs.append(neg)
    return jnp.stack(mags), jnp.stack(signs)


# ---------------------------------------------------------------------------
# Static window geometry
# ---------------------------------------------------------------------------

class Geometry:
    """Static per-window layout: window w has nb real buckets spread
    over nb_v virtual lanes as R = nb_v/nb interleaved replicas (R > 1
    only when nb < the 128-lane minimum). All windows share the same
    bucket count so every reduction dispatch runs at ONE constant width
    — the whole MSM uses exactly two Mosaic kernel shapes (the mixed-add
    accumulator and the full add), keeping TPU compile time flat."""

    def __init__(self, n: int, c: int, num_bits: int = NUM_BITS,
                 cap: int | None = None):
        self.n, self.c = n, c
        self.W = (num_bits + c - 1) // c
        self.nb = 1 << (c - 1)
        self.nb_v = max(self.nb, LANE)
        # Per-window real bucket counts: the TOP window only spans
        # 2^(num_bits - c*(W-1)) magnitudes, so its buckets are spread
        # over proportionally more replica lanes — otherwise its run
        # lengths are n/2^top_bits (≫ cap; at n=2^16/c=13 they hit 1024
        # and the round cap can never fit them).
        self.nb_ws = []
        for w in range(self.W):
            bits_w = min(c, num_bits - c * w)
            # signed-digit magnitudes: full windows in [0, 2^(c-1)];
            # the top window in [0, 2^bits_w] (carry in, never out)
            self.nb_ws.append(min(self.nb, 1 << bits_w))
        self.R_ws = [self.nb_v // nb_w for nb_w in self.nb_ws]
        self.R = self.R_ws[0]
        self.lanes = self.W * self.nb_v
        if cap is None:
            # The TOP window's digit range is data-dependent (scalars < r
            # occupy only ~r/2^(c(W-1)) of its 2^bits_w magnitudes), so
            # live lanes there see up to ~2x the mean load — measured:
            # tmax 605 vs lambda 256 at n=2^20/c=12. cap is only the
            # fori upper bound (the traced tmax bound stops at the ACTUAL
            # max run), so headroom is free; a tight cap forced a silent
            # drop->retry that DOUBLED every warm MSM.
            lam = max(n / self.nb_v, 1.0)
            cap = int(2 * lam + 10.0 * math.sqrt(lam) + 64)
        self.cap = cap

    def maps(self):
        """Static per-lane numpy maps: real-bucket key index, replica,
        replica count and per-window bucket count (all per-lane)."""
        lane = np.arange(self.lanes)
        w = lane // self.nb_v
        off = lane % self.nb_v
        nb_l = np.asarray(self.nb_ws, np.int32)[w]
        R_l = np.asarray(self.R_ws, np.int32)[w]
        rep = (off // nb_l).astype(np.int32)
        b = (off % nb_l).astype(np.int32)
        key_of_lane = (w * (self.nb + 1) + b).astype(np.int32)
        return key_of_lane, rep, R_l, nb_l


# ---------------------------------------------------------------------------
# The mixed-add Pallas kernel (acc projective 16-bit planes; new points
# as [48, 128] u16 tiles; meta row: bit0 = valid, bit1 = negate-Y)
# ---------------------------------------------------------------------------

_TWO_P_LIMBS16 = [((2 * P.Q) >> (16 * i)) & 0xFFFF for i in range(L)]


def _mixed_rcb13(x1, y1, z1, x2, y2, mm=None):
    """RCB complete mixed add (2015/1060 alg 8, a=0, b3=3), 13-bit lazy
    field ops. Inputs: 13-bit row lists; P1 projective (any per-lane
    Montgomery factor, coords < 9.1p); P2 affine in R13-Montgomery form
    (< 8p after optional negation), Z2 = 1 implicit. Handles P1 =
    (0:Y:0). 11 Montgomery muls.

    Bound walk (p-multiples): t0,t1 < 1.1; t3 < 9.1; t4,Y3 < 10.2;
    t2 = 3*z1 < 27.3 (hence the 32p-offset sub for t1); t1' < 33.1;
    Z3 < 28.4; all mm operand products k1*k2 <= ~940 keep outputs
    < 1.09p; outputs X3 < 9.1p, Y3/Z3 < 2.2p."""
    mm, add, sub = (mm or _mm13), _add13, _sub13
    tri = lambda v: add(add(v, v), v)
    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t3 = mm(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))                  # X1Y2 + X2Y1
    t4 = add(mm(y2, z1), y1)                   # Y1 + Y2 Z1
    Y3 = add(mm(x2, z1), x1)                   # X1 + X2 Z1
    X3 = add(t0, t0)
    t0 = add(X3, t0)                           # 3 X1X2
    t2 = tri(z1)                               # b3 Z1 (< 27.3p)
    Z3 = add(t1, t2)
    t1 = _sub13_32(t1, t2)
    Y3 = tri(Y3)
    X3 = sub(mm(t3, t1), mm(t4, Y3))
    Y3 = add(mm(Y3, t0), mm(t1, Z3))
    Z3 = add(mm(Z3, t4), mm(t0, t3))
    return X3, Y3, Z3


def _acc_kernel(ax, ay, az, xy, meta, ox, oy, oz):
    """One accumulation round over a block of lanes.
    ax/ay/az: [24, block] u32 planes (acc, lazy representatives)
    xy:       [48, block] u32 planes (affine X||Y in 16-bit limbs,
              assembled from the gathered point tiles in XLA — Mosaic
              rejects in-kernel concatenation of 128-lane tiles)
    meta:     [1, block] int32 (bit0 valid, bit1 negate)"""
    rows = lambda ref: [ref[i, :] for i in range(L)]
    x2r = [xy[i, :] for i in range(L)]
    y2r = [xy[L + i, :] for i in range(L)]
    m = meta[0, :]
    valid = (m & 1) != 0
    negate = (m & 2) != 0
    x1 = _to13(rows(ax))
    y1 = _to13(rows(ay))
    z1 = _to13(rows(az))
    x2 = _to13(x2r)
    y2 = _to13(y2r)
    zero = [jnp.zeros_like(y2[0]) for _ in range(L13)]
    ny2 = _sub13(zero, y2)                     # 8p - Y (valid representative)
    y2 = [jnp.where(negate, a, b) for a, b in zip(ny2, y2)]
    X, Y, Z = _mixed_rcb13(x1, y1, z1, x2, y2)
    X, Y, Z = _from13(X), _from13(Y), _from13(Z)
    for i in range(L):
        ox[i, :] = jnp.where(valid, X[i], ax[i, :])
        oy[i, :] = jnp.where(valid, Y[i], ay[i, :])
        oz[i, :] = jnp.where(valid, Z[i], az[i, :])


def _g1_add_lazy(p, q, block: int | None = None):
    """Full (non-mixed) RCB complete add via the 13-bit lazy kernel.
    Valid for lazy (non-canonical) representatives on BOTH operands —
    unlike ep.g1_add_traced's CPU path, whose 16-bit fw subs assume
    canonical inputs. Widths < 128 are padded."""
    B = p["X"].shape[1]
    Bp = max(LANE, ((B + LANE - 1) // LANE) * LANE)
    if Bp != B:
        p = ep._pad_lanes(p, Bp)
        q = ep._pad_lanes(q, Bp)
    if jax.default_backend() == "cpu":
        rows = lambda v: [v[i] for i in range(L)]
        X, Y, Z = ep._rcb_add_13(rows(p["X"]), rows(p["Y"]), rows(p["Z"]),
                                 rows(q["X"]), rows(q["Y"]), rows(q["Z"]),
                                 mm=_mm13_rolled)
        out = {"X": jnp.stack(X), "Y": jnp.stack(Y), "Z": jnp.stack(Z)}
    else:
        if block is None:
            block = ep._pick_block(Bp)
        bs = lambda: pl.BlockSpec((L, block), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        pp, nn = ep._p_plane(Bp), ep._n_plane(Bp)
        x, y, z = pl.pallas_call(
            ep._add_kernel_rcb13,
            grid=(Bp // block,),
            in_specs=[bs() for _ in range(8)],
            out_specs=(bs(), bs(), bs()),
            out_shape=tuple(jax.ShapeDtypeStruct((L, Bp), jnp.uint32)
                            for _ in range(3)),
        )(p["X"], p["Y"], p["Z"], q["X"], q["Y"], q["Z"], pp, nn)
        out = {"X": x, "Y": y, "Z": z}
    if Bp != B:
        out = {k: v[:, :B] for k, v in out.items()}
    return out


def _acc_round(acc, xy, meta, block: int = 2048):
    """acc: dict of [24, lanes]; xy [48, lanes] u32 (affine X||Y 16-bit
    limb planes); meta [1, lanes] int32. One mixed-add round, all lanes."""
    lanes = acc["X"].shape[1]
    if jax.default_backend() == "cpu":
        # pure-jnp fallback (same math via the rolled mm, no Mosaic)
        x2r = [xy[i, :] for i in range(L)]
        y2r = [xy[L + i, :] for i in range(L)]
        m = meta[0, :]
        valid = (m & 1) != 0
        negate = (m & 2) != 0
        rows = lambda v: [v[i, :] for i in range(L)]
        x1, y1, z1 = (_to13(rows(acc[k])) for k in ("X", "Y", "Z"))
        x2, y2 = _to13(x2r), _to13(y2r)
        zero = [jnp.zeros_like(y2[0]) for _ in range(L13)]
        ny2 = _sub13(zero, y2)
        y2 = [jnp.where(negate, a, b) for a, b in zip(ny2, y2)]
        X, Y, Z = _mixed_rcb13(x1, y1, z1, x2, y2, mm=_mm13_rolled)
        X = jnp.stack(_from13(X))
        Y = jnp.stack(_from13(Y))
        Z = jnp.stack(_from13(Z))
        v = valid[None, :]
        return {"X": jnp.where(v, X, acc["X"]),
                "Y": jnp.where(v, Y, acc["Y"]),
                "Z": jnp.where(v, Z, acc["Z"])}
    block = min(block, lanes)
    grid = (lanes // block,)
    bs_acc = lambda: pl.BlockSpec((L, block), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    bs_xy = pl.BlockSpec((48, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    bs_meta = pl.BlockSpec((1, block), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    x, y, z = pl.pallas_call(
        _acc_kernel,
        grid=grid,
        in_specs=[bs_acc(), bs_acc(), bs_acc(), bs_xy, bs_meta],
        out_specs=(bs_acc(), bs_acc(), bs_acc()),
        out_shape=tuple(jax.ShapeDtypeStruct((L, lanes), jnp.uint32)
                        for _ in range(3)),
    )(acc["X"], acc["Y"], acc["Z"], xy, meta)
    return {"X": x, "Y": y, "Z": z}


# ---------------------------------------------------------------------------
# The fused pipeline
# ---------------------------------------------------------------------------

def _schedule_body(geo: Geometry, table_u16, slimbs):
    """The gather-free schedule: recode + ONE sort + elementwise index
    derivation + point-row materialization. Returns (xy [cap, 48, lanes]
    u32 limb planes, meta [cap, 1, lanes] int32, dropped scalar)."""
    n, c, W, nb = geo.n, geo.c, geo.W, geo.nb
    lanes, cap = geo.lanes, geo.cap
    key_of_lane, rep_of_lane, R_of_lane, _ = geo.maps()
    nkeys = W * (nb + 1)
    ntiles = lanes // 128

    mag, sign = signed_digits(slimbs, c, W)              # [W, n]
    bucket = mag - 1                                     # -1 = skip
    key = (jnp.arange(W, dtype=jnp.int32)[:, None] * (nb + 1)
           + jnp.where(bucket < 0, nb, bucket))          # [W, n]
    payload = (jnp.arange(n, dtype=jnp.int32)[None, :]
               | (sign.astype(jnp.int32) << 30))
    skey, spay = jax.lax.sort(
        (key.reshape(W * n), payload.reshape(W * n)),
        dimension=0, num_keys=1)
    starts = jnp.searchsorted(skey, jnp.arange(nkeys, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(skey, jnp.arange(nkeys, dtype=jnp.int32),
                            side="right").astype(jnp.int32)

    # per-lane run geometry (elementwise over small [lanes] arrays)
    kol = jnp.asarray(key_of_lane)
    start_l = jnp.take(starts, kol)
    end_l = jnp.take(ends, kol)
    R_l = jnp.asarray(R_of_lane)
    rep_l = jnp.asarray(rep_of_lane)
    # replica of sorted position p (within run) = (p - start) mod R;
    # lane (b, rep) consumes positions start + ((rep - start) mod R)
    # + t*R — elementwise, no rank computation needed:
    r0 = (rep_l - start_l) % R_l
    base_l = start_l + r0                                # first position

    # overflow guard: points a lane cannot consume within `cap` rounds
    consumed = jnp.minimum(
        jnp.maximum((end_l - base_l + R_l - 1) // R_l, 0), cap)
    need = jnp.maximum((end_l - base_l + R_l - 1) // R_l, 0)
    dropped = jnp.sum(need - consumed)

    # materialization indices for all slots [cap, lanes]
    t_idx = jnp.arange(cap, dtype=jnp.int32)[:, None]
    pos = base_l[None, :] + t_idx * R_l[None, :]         # [cap, lanes]
    valid = pos < end_l[None, :]
    pos_c = jnp.where(valid, pos, 0)
    src = jnp.take(spay, pos_c.reshape(-1))              # [cap*lanes]
    pt_idx = src & ((1 << 30) - 1)
    neg = (src >> 30) & 1
    rows = jnp.take(table_u16, pt_idx, axis=0)           # [cap*lanes, 48]
    # [cap, ntiles, 128, 48] -> batched 128x48 tile transpose (runs at
    # memory speed, unlike a monolithic [cap*lanes, 48] transpose) ->
    # [cap, 48, lanes] u32 limb planes the kernel consumes directly
    xy = jnp.transpose(
        rows.reshape(cap, ntiles, 128, 48).astype(jnp.uint32),
        (0, 1, 3, 2))                                    # [cap,nt,48,128]
    xy = jnp.transpose(xy, (0, 2, 1, 3)).reshape(cap, 48, lanes)
    meta = (valid.reshape(-1).astype(jnp.int32)
            | (neg << 1)).reshape(cap, 1, lanes)
    return xy, meta, dropped


def _schedule_light(geo: Geometry, slimbs):
    """Recode + sort + per-lane run geometry WITHOUT materializing the
    [cap, ...] slot tensors: the TPU driver gathers point rows per round
    inside the accumulation loop, so rounds past the true max run length
    (tmax <= cap) skip both their gather and their EC work."""
    n, c, W, nb = geo.n, geo.c, geo.W, geo.nb
    cap = geo.cap
    key_of_lane, rep_of_lane, R_of_lane, _ = geo.maps()
    nkeys = W * (nb + 1)

    mag, sign = signed_digits(slimbs, c, W)
    bucket = mag - 1
    key = (jnp.arange(W, dtype=jnp.int32)[:, None] * (nb + 1)
           + jnp.where(bucket < 0, nb, bucket))
    payload = (jnp.arange(n, dtype=jnp.int32)[None, :]
               | (sign.astype(jnp.int32) << 30))
    skey, spay = jax.lax.sort(
        (key.reshape(W * n), payload.reshape(W * n)),
        dimension=0, num_keys=1)
    starts = jnp.searchsorted(skey, jnp.arange(nkeys, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(skey, jnp.arange(nkeys, dtype=jnp.int32),
                            side="right").astype(jnp.int32)
    kol = jnp.asarray(key_of_lane)
    start_l = jnp.take(starts, kol)
    end_l = jnp.take(ends, kol)
    R_l = jnp.asarray(R_of_lane)
    rep_l = jnp.asarray(rep_of_lane)
    r0 = (rep_l - start_l) % R_l
    base_l = start_l + r0
    need = jnp.maximum((end_l - base_l + R_l - 1) // R_l, 0)
    tmax = jnp.minimum(jnp.max(need), cap)
    dropped = jnp.sum(need - jnp.minimum(need, cap))
    return spay, base_l, end_l, R_l, tmax, dropped


def _msm_v2_raw(geo: Geometry, B: int):
    n, c, W, nb = geo.n, geo.c, geo.W, geo.nb
    nb_v, lanes, cap = geo.nb_v, geo.lanes, geo.cap
    ntiles = lanes // 128

    def run(table_u16, slimbs):
        spay, base_l, end_l, R_l, tmax, dropped = _schedule_light(geo, slimbs)

        ident = ep._identity_lm(lanes)
        # NOTE (round-4 measurement, tools/profile_gather*.py): XLA:TPU row
        # gathers cost ~29 ns/row for ANY materializing formulation tried
        # (u16[48]/u32[24] tables, per-round/batched takes, transposed or
        # reshaped-dense outputs all land 29-55 ns/row; only gathers fused
        # into a full reduction reach ~9 ns/row). The per-round gather
        # below is therefore already at the XLA gather floor; the next
        # structural win is a Pallas streaming radix-partition of the rows
        # (no random access), sketched in SCALING.md.

        def body(t, acc3):
            # materialize THIS round's points: elementwise positions ->
            # payload -> u16 point rows -> batched tile transpose
            pos = base_l + t * R_l                       # [lanes]
            valid = pos < end_l
            src = jnp.take(spay, jnp.where(valid, pos, 0))
            pt_idx = src & ((1 << 30) - 1)
            neg = (src >> 30) & 1
            rows = jnp.take(table_u16, pt_idx, axis=0)   # [lanes, 48]
            xyt = jnp.transpose(
                rows.reshape(ntiles, 128, 48).astype(jnp.uint32),
                (0, 2, 1))                               # [nt, 48, 128]
            xyt = jnp.transpose(xyt, (1, 0, 2)).reshape(48, lanes)
            mt = (valid.astype(jnp.int32) | (neg << 1)).reshape(1, lanes)
            acc = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}
            out = _acc_round(acc, xyt, mt)
            return (out["X"], out["Y"], out["Z"])

        acc3 = jax.lax.fori_loop(0, tmax, body,
                                 (ident["X"], ident["Y"], ident["Z"]))
        acc = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}

        # --- reduction: ONE fori_loop whose body holds the single full-
        # add Pallas instance; per-step shift amounts and lane masks ride
        # as indexed arrays. (Unrolling emitted ~26 Mosaic custom calls
        # that each paid their own device compile — the dominant cost of
        # the first run. With the loop there are exactly TWO Mosaic
        # kernels in the whole MSM: the mixed-add accumulator and this
        # full add.) Wrap-around lanes of the jnp.roll are masked to
        # identity so cross-window contamination never lands.
        off = np.arange(lanes) % nb_v
        w_of = np.arange(lanes) // nb_v
        nb_l = np.asarray(geo.nb_ws, np.int32)[w_of]
        steps_list, masks_list = [], []

        def plan_step(step, keep):
            steps_list.append(step)
            masks_list.append(keep)

        # replica folds (layout rep*nb_w + b): fold upper replica halves.
        # Windows with different (nb_w, R_w) need different shift
        # distances, so folds are planned per distinct class; the keep
        # masks confine each fold to its class's lanes.
        for nb_w, R_w in sorted(set(zip(geo.nb_ws, geo.R_ws))):
            in_class = nb_l == nb_w
            r = R_w
            while r > 1:
                half = r // 2
                plan_step(half * nb_w, in_class & (off < half * nb_w))
                r = half
        # After the folds, lanes beyond the first replica (off >= nb_w)
        # are stale. No explicit masking is needed: every subsequent
        # step's keep-mask only ADDS from sources with off + step < nb_w
        # (live by induction), and only lane 0 per window is read at the
        # end.
        live = off < nb_l
        # suffix scan: SS_i = sum_{j>=i} S_j per window (Hillis-Steele)
        step = 1
        while step < nb:
            plan_step(step, (off + step < nb_l) & live)
            step *= 2
        # tree sum: T_w = sum_i SS_i = sum_j (j+1) S_j
        step = 1
        while step < nb:
            plan_step(step, (off % (2 * step) == 0) & (off + step < nb_l))
            step *= 2

        steps_arr = jnp.asarray(np.array(steps_list, np.int32))
        masks_arr = jnp.asarray(np.stack(masks_list))

        def red_body(i, acc3):
            acc_d = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}
            step = steps_arr[i]
            keep = masks_arr[i]
            shifted = {k: jnp.roll(v, -step, axis=1)
                       for k, v in acc_d.items()}
            shifted = ep._mask_identity(shifted, keep)
            out = _g1_add_lazy(acc_d, shifted)
            return (out["X"], out["Y"], out["Z"])

        acc3 = jax.lax.fori_loop(0, len(steps_list), red_body,
                                 (acc["X"], acc["Y"], acc["Z"]))
        acc = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}

        # window totals live in each window's lane 0
        sums = {k: v[:, ::nb_v] for k, v in acc.items()}
        sums = ep._pad_lanes(sums, LANE)
        return sums["X"], sums["Y"], sums["Z"], dropped

    return run


def _lm_proj_to_jac_ints(p):
    """Lazy homogeneous-projective [L, B] planes -> canonical Jacobian
    int tuples (X*Z, Y*Z^2, Z). Unlike ep.g1_lm_to_jac_ints this does
    not consult the kernel-flavor env: the v2 pipeline is always
    projective (rcb13)."""
    Rinv = pow(FQ.R, -1, P.Q)
    # ONE device fetch for all three planes: each np.asarray is a full
    # host sync (~20ms round trip on the dev tunnel); stacking makes the
    # extract tail one round trip instead of three
    XYZ = np.asarray(jnp.stack([p["X"], p["Y"], p["Z"]]))
    X, Y, Z = XYZ[0], XYZ[1], XYZ[2]
    out = []
    for i in range(X.shape[1]):
        z = ep._col_to_int(Z[:, i]) * Rinv % P.Q
        if z == 0:
            out.append((0, 1, 0))
            continue
        x = ep._col_to_int(X[:, i]) * Rinv % P.Q
        y = ep._col_to_int(Y[:, i]) * Rinv % P.Q
        out.append((x * z % P.Q, y * z * z % P.Q, z))
    return out


@functools.lru_cache(maxsize=None)
def _acc_round_jit(lanes: int):
    def f(ax, ay, az, xy, meta):
        o = _acc_round({"X": ax, "Y": ay, "Z": az}, xy, meta)
        return o["X"], o["Y"], o["Z"]
    return jax.jit(f)


def _cpu_driver(geo: Geometry, sched):
    """Eager CPU driver: jitted schedule + one cached jitted accumulation
    round + HOST-integer bucket reduction. The single-jit TPU pipeline is
    unusable on the XLA CPU backend (compile time explodes on the inlined
    EC-add graphs); host reduction is ~2 adds/lane of Python ints."""
    from ..curves import sw_fast as g1f
    lanes, cap = geo.lanes, geo.cap

    def run(table_u16, slimbs):
        xy, meta, dropped = sched(table_u16, slimbs)
        dropped = int(np.asarray(dropped))
        if dropped:
            return None, dropped
        accf = _acc_round_jit(lanes)
        ident = ep._identity_lm(lanes)
        ax, ay, az = ident["X"], ident["Y"], ident["Z"]
        for t in range(cap):
            ax, ay, az = accf(ax, ay, az, xy[t], meta[t])
        pts = _lm_proj_to_jac_ints({"X": ax, "Y": ay, "Z": az})
        jacs = []
        for w in range(geo.W):
            nb_w, R_w = geo.nb_ws[w], geo.R_ws[w]
            base = w * geo.nb_v
            running, total = None, None
            for b in range(nb_w - 1, -1, -1):
                for rep in range(R_w):
                    p = pts[base + rep * nb_w + b]
                    if p[2] == 0:
                        continue
                    running = p if running is None else g1f.jac_add(running, p)
                if running is not None:
                    total = running if total is None \
                        else g1f.jac_add(total, running)
            jacs.append(total if total is not None else (0, 1, 0))
        return jacs, 0

    return run


@functools.lru_cache(maxsize=None)
def _msm_v2_fn(n: int, c: int, B: int, cap: int | None):
    """Cached per (n, c, B, cap): a FRESH jax.jit wrapper per call made
    every warm MSM pay ~1.9 s of retrace/executable-reload on top of the
    1.2 s device program (measured tools/profile_msm_phases.py)."""
    geo = Geometry(n, c, cap=cap)
    if jax.default_backend() == "cpu":
        sched = jax.jit(
            functools.partial(_schedule_body, geo))
        return geo, _cpu_driver(geo, sched)

    raw = jax.jit(_msm_v2_raw(geo, B))

    def run(table_u16, slimbs):
        sX, sY, sZ, dropped = raw(table_u16, slimbs)
        dropped = int(np.asarray(dropped))
        if dropped:
            return None, dropped
        sums = {"X": sX, "Y": sY, "Z": sZ}
        return _lm_proj_to_jac_ints(sums)[:geo.W], 0

    return geo, run


def msm_g1_v2(table_u16, scalar_limbs, n: int, c: int | None = None,
              cap: int | None = None, ident_mask=None):
    """MSM over an affine u16 point table (pack_points_u16). Returns the
    host Jacobian int tuple. scalar_limbs: [n, 16] u32 canonical Fr limbs.
    ident_mask: optional [B] bool (identity rows contribute nothing)."""
    if c is None:
        # c=12 beats c=13 at 2^20 on v5e (fewer lanes: 45k vs 82k; the
        # c=12 top window is tiny and well-replicated) — see SCALING.md
        c = int(os.environ.get("SNARKVM_TPU_MSM_V2_C", "0")) or \
            (12 if n >= (1 << 12) else 10)
    if ident_mask is not None and np.any(ident_mask[:n]):
        scalar_limbs = jnp.where(
            jnp.asarray(ident_mask[:n])[:, None], 0, scalar_limbs)
    B = table_u16.shape[0]
    geo, fn = _msm_v2_fn(n, c, B, cap)
    jacs, dropped = fn(table_u16, scalar_limbs)
    if dropped:
        # degenerate digit distribution exceeded the static round cap:
        # retry once with 4x headroom, then fall back to the host-int
        # Pippenger (a cap-of-n device pipeline would allocate
        # cap*lanes*192B of schedule slots — uncompilable at scale)
        geo, fn2 = _msm_v2_fn(n, c, B, geo.cap * 4 + 64)
        jacs, dropped = fn2(table_u16, scalar_limbs)
        if dropped:
            return _host_fallback(table_u16, scalar_limbs, n)
    return _combine(jacs[:geo.W], c)


def _host_fallback(table_u16, scalar_limbs, n: int):
    """Adversarial-distribution escape hatch: exact host-integer MSM over
    the unpacked table (csrc/g1_msm.c when available, else sw_fast)."""
    from ..curves import sw_fast as g1f
    tbl = np.asarray(table_u16)[:n].astype(np.uint64)
    sl = np.asarray(scalar_limbs)[:n].astype(np.uint64)
    rinv = pow(_R13_MONT, -1, P.Q)
    shifts16 = [16 * i for i in range(24)]
    pts, scs = [], []
    for i in range(n):
        s = 0
        for j in range(16):
            s |= int(sl[i, j]) << (16 * j)
        if s == 0:
            continue
        x = sum(int(tbl[i, j]) << shifts16[j] for j in range(24)) * rinv % P.Q
        y = sum(int(tbl[i, 24 + j]) << shifts16[j] for j in range(24)) * rinv % P.Q
        if x == 0 and y == 0:
            continue
        pts.append((x, y))
        scs.append(s)
    if not pts:
        return (0, 1, 0)
    return g1f.msm(pts, scs)


def _combine(jacs, c: int):
    from ..curves import sw_fast as g1f
    total = None
    for w in range(len(jacs) - 1, -1, -1):
        if total is not None:
            for _ in range(c):
                total = g1f.jac_double(total)
        if jacs[w][2] != 0:
            total = jacs[w] if total is None else g1f.jac_add(total, jacs[w])
    return total if total is not None else (0, 1, 0)
