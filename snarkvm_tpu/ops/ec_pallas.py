"""Pallas TPU kernels for BLS12-377 G1 (limb-major) + MSM.

Why this exists: the XLA limb-plane EC path (ops/ec.py) costs ~5s of XLA
compile PER g1_add instance on CPU (each rolled Montgomery REDC becomes a
separate fori subcomputation), so a Pippenger graph with dozens of adds
times dozens of windows is untenable to compile. Here each EC op is ONE
Mosaic kernel — compiled once, invoked everywhere — so the surrounding
XLA graph is just gathers/sorts plus custom-calls.

Layout: limb-major [L=24, B] uint32 per coordinate (limbs on sublanes,
batch on lanes), Montgomery form — the same layout as the Pallas NTT
(pallas_field.py).

Kernel flavors (SNARKVM_TPU_EC_KERNEL):
  * "rcb" (default) — Renes-Costello-Batina COMPLETE projective add
    (12 muls, identity (0:1:0), one kernel for add+double) over the
    full-width-Montgomery field ops (MXU diag matmul + Kogge-Stone).
  * "rcb_cios" — same formulas over row-unrolled CIOS field ops.
  * "fw"/"unrolled" — the legacy branchy Jacobian complete add
    (identity Z=0; 25 muls incl. the embedded double branch).

MSM (replaces algorithms/src/msm/variable_base/batched.rs:366 for the
device path): per window, sort-by-digit, then (method="rounds") lanes =
buckets with one masked gather+add per round — O(n) EC work like the
reference's batched.rs — or (method="scan") a Hillis-Steele prefix scan
over all lanes. Window combination happens on host ints (tiny)."""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limb import FQ, FR, MASK, BASE_BITS
from ..params import bls12_377 as P
from . import pallas_field as pf

L = FQ.L          # 24 limbs of 16 bits
LANE = 128        # min/natural lane tile


# ---------------------------------------------------------------------------
# In-kernel helpers — TENSORIZED [L, B] 2D form.
#
# The row-list helpers in pallas_field unroll the full L x L schoolbook
# (≈5k ops per mul): right for the single-mul butterfly kernel, fatal for
# a 27-mul EC kernel (the traced graph hits ~130k ops and interpret-mode
# compiles take minutes). Here the product is ONE [L, L, B] multiply and
# column accumulation is L static-slice adds, ~370 ops per mul.
# ---------------------------------------------------------------------------


def _mm2(a, b, pp, spec=FQ):
    """Montgomery mul. a/b: [L, B] uint32; pp: [L, B] modulus plane
    (p limbs broadcast across lanes — kernels cannot capture constant
    arrays, so the modulus rides in as an input)."""
    l = spec.L
    B = a.shape[1]
    rows = 2 * l + 1

    def off(x, i):
        """Place [l, B] (or [1, B]) block at row offset i of [rows, B]."""
        return jnp.pad(x, ((i, rows - i - x.shape[0]), (0, 0)))

    prod = a[:, None, :] * b[None, :, :]                # [L, L, B]
    lo = prod & MASK
    hi = prod >> BASE_BITS
    # scatter-free column accumulation (Mosaic has no scatter-add):
    # each partial product block is zero-padded to full height and added
    cols = jnp.zeros((rows, B), jnp.uint32)
    for i in range(l):
        cols = cols + off(lo[i], i) + off(hi[i], i + 1)
    n0 = jnp.uint32(spec.n0)
    for i in range(l):
        m = (cols[i] * n0) & MASK                       # [B]
        mp = m[None, :] * pp                            # [L, B]
        cols = cols + off(mp & MASK, i) + off(mp >> BASE_BITS, i + 1)
        cols = cols + off((cols[i] >> BASE_BITS)[None, :], i + 1)
    return _condsub2(_carries2(cols[l : 2 * l + 1], l), pp, spec)


def _carries2(cols, l):
    outs = []
    carry = jnp.zeros_like(cols[0])
    for i in range(l):
        t = cols[i] + carry
        outs.append(t & MASK)
        carry = t >> BASE_BITS
    return jnp.stack(outs)


def _condsub2(x, pp, spec=FQ):
    borrow = jnp.zeros_like(x[0])
    diff = []
    for i in range(spec.L):
        t = x[i] + (1 << BASE_BITS) - pp[i] - borrow
        diff.append(t & MASK)
        borrow = 1 - (t >> BASE_BITS)
    diff = jnp.stack(diff)
    return jnp.where((borrow != 0)[None, :], x, diff)


def _add2(a, b, pp, spec=FQ):
    carry = jnp.zeros_like(a[0])
    out = []
    for i in range(spec.L):
        t = a[i] + b[i] + carry
        out.append(t & MASK)
        carry = t >> BASE_BITS
    return _condsub2(jnp.stack(out), pp, spec)


def _sub2(a, b, pp, spec=FQ):
    borrow = jnp.zeros_like(a[0])
    diff = []
    for i in range(spec.L):
        t = a[i] + (1 << BASE_BITS) - b[i] - borrow
        diff.append(t & MASK)
        borrow = 1 - (t >> BASE_BITS)
    diff = jnp.stack(diff)
    carry = jnp.zeros_like(a[0])
    fixed = []
    for i in range(spec.L):
        t = diff[i] + pp[i] + carry
        fixed.append(t & MASK)
        carry = t >> BASE_BITS
    fixed = jnp.stack(fixed)
    return jnp.where((borrow != 0)[None, :], fixed, diff)


def _is_zero_rows(x):
    return jnp.all(x == 0, axis=0)       # [B] bool


def _select_rows(mask, a, b):
    """mask: [B] bool -> where(mask, a, b) over [L, B]."""
    return jnp.where(mask[None, :], a, b)


def _zero_rows_like(x):
    return jnp.zeros_like(x)


def _double_rows(x1, y1, z1, pp):
    """dbl-2009-l: complete for nonzero points (a=0 curve)."""
    mm = lambda a, b: _mm2(a, b, pp)
    add = lambda a, b: _add2(a, b, pp)
    sub = lambda a, b: _sub2(a, b, pp)
    A = mm(x1, x1)
    B = mm(y1, y1)
    C = mm(B, B)
    t = add(x1, B)
    t = mm(t, t)
    t = sub(sub(t, A), C)
    D = add(t, t)
    E = add(add(A, A), A)
    F = mm(E, E)
    X3 = sub(F, add(D, D))
    C2 = add(C, C)
    C4 = add(C2, C2)
    C8 = add(C4, C4)
    Y3 = sub(mm(E, sub(D, X3)), C8)
    YZ = mm(y1, z1)
    Z3 = add(YZ, YZ)
    return X3, Y3, Z3


def _add_rows(x1, y1, z1, x2, y2, z2, pp):
    """Complete Jacobian add (inf / doubling / inverse handled by selects)."""
    mm = lambda a, b: _mm2(a, b, pp)
    add = lambda a, b: _add2(a, b, pp)
    sub = lambda a, b: _sub2(a, b, pp)
    inf1 = _is_zero_rows(z1)
    inf2 = _is_zero_rows(z2)

    Z1Z1 = mm(z1, z1)
    Z2Z2 = mm(z2, z2)
    U1 = mm(x1, Z2Z2)
    U2 = mm(x2, Z1Z1)
    S1 = mm(mm(y1, z2), Z2Z2)
    S2 = mm(mm(y2, z1), Z1Z1)
    H = sub(U2, U1)
    r = sub(S2, S1)
    h_zero = _is_zero_rows(H)
    r_zero = _is_zero_rows(r)
    same = h_zero & r_zero
    opp = h_zero & (~r_zero)

    H2 = add(H, H)
    I = mm(H2, H2)
    J = mm(H, I)
    r2 = add(r, r)
    V = mm(U1, I)
    X3 = sub(sub(mm(r2, r2), J), add(V, V))
    S1J = mm(S1, J)
    Y3 = sub(mm(r2, sub(V, X3)), add(S1J, S1J))
    ZZ = add(z1, z2)
    ZZ = mm(ZZ, ZZ)
    Z3 = mm(sub(sub(ZZ, Z1Z1), Z2Z2), H)

    dx, dy, dz = _double_rows(x1, y1, z1, pp)
    X = _select_rows(same, dx, X3)
    Y = _select_rows(same, dy, Y3)
    Z = _select_rows(same, dz, Z3)
    Z = _select_rows(opp, _zero_rows_like(Z), Z)
    X = _select_rows(inf1, x2, _select_rows(inf2, x1, X))
    Y = _select_rows(inf1, y2, _select_rows(inf2, y1, Y))
    Z = _select_rows(inf1, z2, _select_rows(inf2, z1, Z))
    return X, Y, Z


# ---------------------------------------------------------------------------
# Full-width Montgomery ("fw") in-kernel field ops — the compile-friendly,
# MXU-assisted variant. No sequential limb loops at all:
#   * partial-product column sums via ONE f32 matmul against a 0/1
#     "diagonal indicator" matrix (exact: every sum < 2^24 < f32 mantissa)
#   * carry/borrow resolution via Kogge-Stone parallel prefix (log2 L steps)
#   * REDC as full-width Montgomery: M = (T mod R)*N' mod R; out = (T+M*p)/R
# Replaces the CIOS form whose fully-unrolled jaxpr (~37k eqns) takes ~4min
# of Mosaic compile per shape. This form is ~5k eqns and runs entirely on
# [L..2L, B] tensor ops (VPU) plus one MXU dot per limb product.
# ---------------------------------------------------------------------------

_ROWS = 2 * L + 1      # 49 columns of the double-width product
_NPRIME = (-pow(P.Q, -1, 1 << (BASE_BITS * L))) % (1 << (BASE_BITS * L))


def _shift_up_rows(x, d):
    """Move limb i's value to limb i+d (carry direction), zero-fill."""
    if d == 0:
        return x
    return jnp.pad(x, ((d, 0), (0, 0)))[: x.shape[0]]


def _ks_norm(cols, nl):
    """cols: [m, B] uint32 column sums (each < 2^32). Returns the first nl
    canonical 16-bit limbs of sum_i cols[i]*2^(16 i) (higher limbs and the
    final carry are truncated — callers guarantee the value fits)."""
    s = (cols & MASK) + _shift_up_rows(cols >> BASE_BITS, 1)
    s = (s & MASK) + _shift_up_rows(s >> BASE_BITS, 1)
    # now s[i] <= 2^16: binary carries via Kogge-Stone prefix scan
    g = s >> BASE_BITS                                   # generate (0/1)
    p = ((s & MASK) == MASK).astype(jnp.uint32)          # propagate
    d = 1
    while d < s.shape[0]:
        g = g | (p & _shift_up_rows(g, d))
        p = p & _shift_up_rows(p, d)
        d <<= 1
    carry_in = _shift_up_rows(g, 1)
    return ((s + carry_in) & MASK)[:nl]


def _ks_borrows(a, b):
    """Borrow-out chain of a - b per limb (canonical limbs). Returns
    [m, B] uint32 0/1 where row i = borrow OUT of limb i."""
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    d = 1
    while d < a.shape[0]:
        g = g | (p & _shift_up_rows(g, d))
        p = p & _shift_up_rows(p, d)
        d <<= 1
    return g


def _sub_canonical(a, b):
    """a - b for canonical limb planes with a >= b. Exact."""
    bo = _ks_borrows(a, b)
    bin_ = _shift_up_rows(bo, 1)
    return (a + (jnp.uint32(1) << BASE_BITS) - b - bin_) & MASK


def _condsub_fw(x, pp):
    """x < 2p canonical -> x mod p."""
    bo = _ks_borrows(x, pp)
    keep = bo[x.shape[0] - 1 : x.shape[0]] != 0          # [1, B] broadcast
    bin_ = _shift_up_rows(bo, 1)
    diff = (x + (jnp.uint32(1) << BASE_BITS) - pp - bin_) & MASK
    return jnp.where(keep, x, diff)


def _ind_diag(l, rows):
    """[rows, 4*l*l] bf16 weighted indicator. The 16-bit lo/hi halves of
    each partial product are further split into 8-bit bytes so every dot
    operand fits bf16 EXACTLY (<= 8 significand bits); weights 1/256 fold
    the byte recombination into the same single matmul. Column t encodes
    product term (i=t//l, j=t%l); blocks: [lo byte0 (w=1, k=i+j),
    lo byte1 (w=256, k=i+j), hi byte0 (w=1, k=i+j+1), hi byte1 (w=256,
    k=i+j+1)]. One default-precision bf16 dot then computes exact column
    sums (every product <= 255*256 and every sum < 2^24, exact in f32)."""
    n = l * l
    k = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    i = t // l
    j = t % l
    lo = (i + j == k)
    hi = (i + j + 1 == k)
    one = jnp.float32(1.0)
    w256 = jnp.float32(256.0)
    parts = [jnp.where(lo, one, 0.0), jnp.where(lo, w256, 0.0),
             jnp.where(hi, one, 0.0), jnp.where(hi, w256, 0.0)]
    return jnp.concatenate(parts, axis=1).astype(jnp.bfloat16)


def _u32_to_f32(x):
    """Mosaic has no uint32<->float32 casts; go through int32 (values are
    always < 2^24 here, so the sign bit is never set)."""
    return jax.lax.bitcast_convert_type(x, jnp.int32).astype(jnp.float32)


def _f32_to_u32(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.uint32)


def _diag_cols(a, b, ind):
    """Column sums of the double-width product a*b. a/b: [l, B] canonical
    limbs. Returns [rows, B] uint32 (each entry < 2*l*2^16 < 2^24)."""
    l, B = a.shape
    prod = a[:, None, :] * b[None, :, :]                 # [l, l, B] u32
    lo = (prod & MASK).reshape(l * l, B)
    hi = (prod >> BASE_BITS).reshape(l * l, B)
    byte0 = jnp.uint32(0xFF)
    stacked = jnp.concatenate(
        [lo & byte0, lo >> 8, hi & byte0, hi >> 8], axis=0)   # [4*l*l, B]
    stacked = _u32_to_f32(stacked).astype(jnp.bfloat16)       # exact (<=255)
    cols = jax.lax.dot_general(
        ind, stacked, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return _f32_to_u32(cols)


def _mm_fw(a, b, pp, nn, ind):
    """Montgomery mul via full-width REDC. a/b: [L, B] Montgomery-form
    canonical limbs; pp/nn: modulus and N' = -p^{-1} mod R planes."""
    t_cols = _diag_cols(a, b, ind)                       # T = a*b   [49, B]
    T = _ks_norm(t_cols, 2 * L)                          # 48 canonical limbs
    m_cols = _diag_cols(T[:L], nn, ind)                  # (T mod R) * N'
    M = _ks_norm(m_cols, L)                              # mod R
    mp_cols = _diag_cols(M, pp, ind)                     # M * p [49, B]
    total = mp_cols + jnp.pad(T, ((0, 1), (0, 0)))       # T + M*p
    S = _ks_norm(total, _ROWS)                           # low L limbs == 0
    return _condsub_fw(S[L : 2 * L], pp)                 # (T + M*p)/R mod p


def _add_fw(a, b, pp):
    s = _ks_norm(a + b, L)                               # a+b < 2p fits L limbs
    return _condsub_fw(s, pp)


def _sub_fw(a, b, pp):
    u = _ks_norm(a + pp, L)                              # a + p (< 2p, L limbs)
    v = _sub_canonical(u, b)                             # a + p - b  (>= 0)
    return _condsub_fw(v, pp)


def _fw_ops(pp, nn):
    ind = _ind_diag(L, _ROWS)
    mm = lambda a, b: _mm_fw(a, b, pp, nn, ind)
    add = lambda a, b: _add_fw(a, b, pp)
    sub = lambda a, b: _sub_fw(a, b, pp)
    return mm, add, sub


def _double_rows_fw(x1, y1, z1, pp, nn):
    mm, add, sub = _fw_ops(pp, nn)
    A = mm(x1, x1)
    B = mm(y1, y1)
    C = mm(B, B)
    t = add(x1, B)
    t = mm(t, t)
    t = sub(sub(t, A), C)
    D = add(t, t)
    E = add(add(A, A), A)
    F = mm(E, E)
    X3 = sub(F, add(D, D))
    C2 = add(C, C)
    C4 = add(C2, C2)
    C8 = add(C4, C4)
    Y3 = sub(mm(E, sub(D, X3)), C8)
    YZ = mm(y1, z1)
    Z3 = add(YZ, YZ)
    return X3, Y3, Z3


def _add_rows_fw(x1, y1, z1, x2, y2, z2, pp, nn):
    mm, add, sub = _fw_ops(pp, nn)
    inf1 = _is_zero_rows(z1)
    inf2 = _is_zero_rows(z2)

    Z1Z1 = mm(z1, z1)
    Z2Z2 = mm(z2, z2)
    U1 = mm(x1, Z2Z2)
    U2 = mm(x2, Z1Z1)
    S1 = mm(mm(y1, z2), Z2Z2)
    S2 = mm(mm(y2, z1), Z1Z1)
    H = sub(U2, U1)
    r = sub(S2, S1)
    h_zero = _is_zero_rows(H)
    r_zero = _is_zero_rows(r)
    same = h_zero & r_zero
    opp = h_zero & (~r_zero)

    H2 = add(H, H)
    I = mm(H2, H2)
    J = mm(H, I)
    r2 = add(r, r)
    V = mm(U1, I)
    X3 = sub(sub(mm(r2, r2), J), add(V, V))
    S1J = mm(S1, J)
    Y3 = sub(mm(r2, sub(V, X3)), add(S1J, S1J))
    ZZ = add(z1, z2)
    ZZ = mm(ZZ, ZZ)
    Z3 = mm(sub(sub(ZZ, Z1Z1), Z2Z2), H)

    dx, dy, dz = _double_rows_fw(x1, y1, z1, pp, nn)
    X = _select_rows(same, dx, X3)
    Y = _select_rows(same, dy, Y3)
    Z = _select_rows(same, dz, Z3)
    Z = _select_rows(opp, _zero_rows_like(Z), Z)
    X = _select_rows(inf1, x2, _select_rows(inf2, x1, X))
    Y = _select_rows(inf1, y2, _select_rows(inf2, y1, Y))
    Z = _select_rows(inf1, z2, _select_rows(inf2, z1, Z))
    return X, Y, Z


def _rcb_add_rows(x1, y1, z1, x2, y2, z2, pp, nn):
    """Renes-Costello-Batina COMPLETE projective add for a=0, b=1 curves
    (eprint 2015/1060 algorithm 7, b3 = 3). Handles doubling, inverses and
    the identity (0:1:0) with NO branches — one kernel covers add+double,
    and the jaxpr is ~12 Montgomery muls instead of the 25 the branchy
    Jacobian complete add needs (add formula + double formula + selects)."""
    mm, add, sub = _fw_ops(pp, nn)
    tri = lambda v: add(add(v, v), v)                    # b3 = 3 (b = 1)
    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t2 = mm(z1, z2)
    t3 = mm(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))                            # X1Y2 + X2Y1
    t4 = mm(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))                            # Y1Z2 + Y2Z1
    X3 = mm(add(x1, z1), add(x2, z2))
    Y3 = sub(X3, add(t0, t2))                            # X1Z2 + X2Z1
    X3 = add(t0, t0)
    t0 = add(X3, t0)                                     # 3*X1X2
    t2 = tri(t2)                                         # b3*Z1Z2
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = tri(Y3)                                         # b3*(X1Z2+X2Z1)
    X3 = sub(mm(t3, t1), mm(t4, Y3))
    Y3 = add(mm(Y3, t0), mm(t1, Z3))
    Z3 = add(mm(Z3, t4), mm(t0, t3))
    return X3, Y3, Z3


def _add_kernel_rcb(x1, y1, z1, x2, y2, z2, pp, nn, xo, yo, zo):
    X, Y, Z = _rcb_add_rows(x1[:, :], y1[:, :], z1[:, :],
                            x2[:, :], y2[:, :], z2[:, :], pp[:, :], nn[:, :])
    xo[:, :] = X
    yo[:, :] = Y
    zo[:, :] = Z


def _rcb_add_rowlist(x1, y1, z1, x2, y2, z2):
    """RCB complete add over ROW-LIST field ops (pallas_field.py style:
    each limb a separate [B] vector, fully unrolled CIOS mont mul). The
    unrolled form measures ~4x faster per mul on real hardware than the
    tensorized [L, B] + Kogge-Stone form; 12 muls keep the jaxpr ~7k eqns
    (vs 37k for the branchy Jacobian complete add), compiling in ~a minute
    once (persistent cache)."""
    mm = lambda a, b: pf.mont_mul_block(a, b, FQ)
    add = lambda a, b: pf.add_block(a, b, FQ)
    sub = lambda a, b: pf.sub_block(a, b, FQ)
    tri = lambda v: add(add(v, v), v)
    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t2 = mm(z1, z2)
    t3 = mm(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mm(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mm(add(x1, z1), add(x2, z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = tri(t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = tri(Y3)
    X3 = sub(mm(t3, t1), mm(t4, Y3))
    Y3 = add(mm(Y3, t0), mm(t1, Z3))
    Z3 = add(mm(Z3, t4), mm(t0, t3))
    return X3, Y3, Z3


def _add_kernel_rcb_cios(x1, y1, z1, x2, y2, z2, pp, nn, xo, yo, zo):
    rows = lambda ref: [ref[i, :] for i in range(L)]
    X, Y, Z = _rcb_add_rowlist(rows(x1), rows(y1), rows(z1),
                               rows(x2), rows(y2), rows(z2))
    for i in range(L):
        xo[i, :] = X[i]
        yo[i, :] = Y[i]
        zo[i, :] = Z[i]


# ---------------------------------------------------------------------------
# 13-bit-limb lazy-reduction field ops ("rcb13") — the fast MSM kernel.
#
# Why 13-bit limbs: with w-bit limbs, partial products are < 2^(2w) and a
# u32 column accumulator holds up to 2^(32-2w) of them before overflow.
# At w=13 (L=30 limbs for the 377-bit Fq) a column receives at most
# 30 (product) + 30 (REDC) + carries < 64 = 2^(32-26) terms, so the CIOS
# inner loops accumulate RAW u32 products — 2 ops per MAC (mul + add)
# instead of the 5 (mul, mask, shift, 2 adds) the 16-bit kernel needs.
#
# Why lazy reduction is sound here: the RCB complete-add formulas are
# projective, so a uniform scalar on (X, Y, Z) is the same group element.
# Dropping every conditional subtraction only grows representatives:
# coordinates at rest stay < 9.1p (sub adds a fixed 8p instead of
# borrow-fixing), mul inputs stay < 28p < 2^382, and the Montgomery
# output bound (T + m*p)/R < p(1 + k1*k2*p/R) stays < 1.1p for
# k1*k2 <= 512 — all verified against the RCB dataflow. Similarly the
# kernel's R = 2^390 (not the pipeline's 2^384) just scales each mul
# output by a power of two that is uniform across X/Y/Z.
#
# Interface: [24, B] 16-bit limb planes (same as every other flavor);
# the 13-bit re-chunking happens in-kernel (~90 ops per coordinate,
# ~2% of an EC add).
# ---------------------------------------------------------------------------

W13 = 13
L13 = 30
MASK13 = np.uint32((1 << W13) - 1)
_R13 = 1 << (W13 * L13)
_N0_13 = (-pow(P.Q, -1, 1 << W13)) % (1 << W13)
_P13 = [(P.Q >> (W13 * i)) & ((1 << W13) - 1) for i in range(L13)]
_P8_13 = [((8 * P.Q) >> (W13 * i)) & ((1 << W13) - 1) for i in range(L13 + 1)]
_P32_13 = [((32 * P.Q) >> (W13 * i)) & ((1 << W13) - 1) for i in range(L13 + 1)]


def _to13(rows24):
    """24 x 16-bit limb rows -> 30 x 13-bit limb rows (same integer)."""
    out = []
    for j in range(L13):
        lo = W13 * j
        i, sh = lo // 16, lo % 16
        v = rows24[i] >> sh if sh else rows24[i]
        if sh + W13 > 16 and i + 1 < 24:
            v = v | (rows24[i + 1] << (16 - sh))
        out.append(v & MASK13)
    return out


def _from13(rows30):
    """30 x 13-bit limb rows -> 24 x 16-bit limb rows (same integer)."""
    out = []
    for i in range(24):
        lo = 16 * i
        j, sh = lo // W13, lo % W13
        v = rows30[j] >> sh if sh else rows30[j]
        got = W13 - sh
        while got < 16 and j + (got // W13) + 1 < L13:
            j2 = j + (got + W13 - 1) // W13
            v = v | (rows30[j2] << got)
            got += W13
        out.append(v & jnp.uint32(0xFFFF))
    return out


def _mm13(a, b):
    """Montgomery mul, 13-bit CIOS, raw-u32 column accumulation, no
    final conditional subtraction (output < 1.1p for inputs < 28p)."""
    cols = [None] * (2 * L13 + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(L13):
        ai = a[i]
        for j in range(L13):
            acc(i + j, ai * b[j])
    zero = jnp.zeros_like(a[0])
    cols = [c if c is not None else zero for c in cols]
    n0 = jnp.uint32(_N0_13)
    for i in range(L13):
        m = (cols[i] * n0) & MASK13
        for j in range(L13):
            cols[i + j] = cols[i + j] + m * jnp.uint32(_P13[j])
        cols[i + 1] = cols[i + 1] + (cols[i] >> W13)
    # high-half carry resolution: the result is < 1.1p < 2^378, so it fits
    # the 30 limbs exactly (top limb never overflows its 13 bits)
    out = []
    carry = zero
    for i in range(L13):
        t = cols[L13 + i] + carry
        out.append(t & MASK13)
        carry = t >> W13
    return out


def _mm13_rolled(a, b):
    """_mm13 with the CIOS loops rolled into lax.scan — identical math,
    ~1/30th the trace size. For CPU/outside-Pallas paths only: the
    unrolled version compiles ~150s on the XLA CPU backend; this one
    compiles in well under a second. Do NOT use inside Pallas kernels
    (dynamic_update_slice-heavy scans don't vectorize under Mosaic)."""
    A = jnp.stack(a)                             # [L13, B]
    Bm = jnp.stack(b)                            # [L13, B]
    width = A.shape[-1]
    cols = jnp.zeros((2 * L13 + 1, width), jnp.uint32)

    def prod_step(cols, i):
        ai = jax.lax.dynamic_index_in_dim(A, i, 0, keepdims=False)
        seg = jax.lax.dynamic_slice(cols, (i, 0), (L13, width))
        seg = seg + ai[None, :] * Bm
        return jax.lax.dynamic_update_slice(cols, seg, (i, 0)), None

    cols, _ = jax.lax.scan(prod_step, cols, jnp.arange(L13))
    n0 = jnp.uint32(_N0_13)
    pvec = jnp.asarray(np.array(_P13, np.uint32))[:, None]

    def redc_step(cols, i):
        ci = jax.lax.dynamic_index_in_dim(cols, i, 0, keepdims=False)
        m = (ci * n0) & MASK13
        seg = jax.lax.dynamic_slice(cols, (i, 0), (L13, width))
        seg = seg + m[None, :] * pvec
        cols = jax.lax.dynamic_update_slice(cols, seg, (i, 0))
        ci = jax.lax.dynamic_index_in_dim(cols, i, 0, keepdims=False)
        c1 = jax.lax.dynamic_index_in_dim(cols, i + 1, 0, keepdims=False)
        cols = jax.lax.dynamic_update_slice(
            cols, (c1 + (ci >> W13))[None, :], (i + 1, 0))
        return cols, None

    cols, _ = jax.lax.scan(redc_step, cols, jnp.arange(L13))

    def carry_step(carry, i):
        t = jax.lax.dynamic_index_in_dim(
            cols, L13 + i, 0, keepdims=False) + carry
        return t >> W13, t & MASK13

    _, out = jax.lax.scan(carry_step, jnp.zeros((width,), jnp.uint32),
                          jnp.arange(L13))
    return [out[i] for i in range(L13)]


def _add13(a, b):
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(L13):
        t = a[i] + b[i] + carry
        out.append(t & MASK13)
        carry = t >> W13
    return out


def _sub13(a, b):
    """a - b + 8p (callers guarantee b < 8p, a + 8p < 2^390; result is the
    exact nonnegative value a + 8p - b). Implemented as the two's-complement
    addition a + 8p + ~b + 1 mod 2^390 — the wrap bit 2^390 is exactly the
    discarded borrow, and per-limb carries in {0, 1, 2} are plain adds."""
    out = []
    carry = jnp.ones_like(a[0])          # the +1 of the complement
    for i in range(L13):
        nb = b[i] ^ MASK13
        t = a[i] + jnp.uint32(_P8_13[i]) + nb + carry
        out.append(t & MASK13)
        carry = t >> W13
    return out


def _sub13_32(a, b):
    """a - b + 32p — for the one mixed-add site where b = 3*Z1 can reach
    27.3p (> the 8p offset _sub13 assumes). Result < a + 32p."""
    out = []
    carry = jnp.ones_like(a[0])
    for i in range(L13):
        nb = b[i] ^ MASK13
        t = a[i] + jnp.uint32(_P32_13[i]) + nb + carry
        out.append(t & MASK13)
        carry = t >> W13
    return out


def _rcb_add_13(x1r, y1r, z1r, x2r, y2r, z2r, mm=None):
    """RCB complete projective add over the 13-bit lazy field ops.
    Inputs/outputs: 24 x 16-bit limb row lists. `mm` selects the
    Montgomery-mul implementation (unrolled in-kernel, rolled on CPU)."""
    x1, y1, z1 = _to13(x1r), _to13(y1r), _to13(z1r)
    x2, y2, z2 = _to13(x2r), _to13(y2r), _to13(z2r)
    mm, add, sub = (mm or _mm13), _add13, _sub13
    tri = lambda v: add(add(v, v), v)
    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t2 = mm(z1, z2)
    t3 = mm(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mm(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mm(add(x1, z1), add(x2, z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = tri(t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = tri(Y3)
    X3 = sub(mm(t3, t1), mm(t4, Y3))
    Y3 = add(mm(Y3, t0), mm(t1, Z3))
    Z3 = add(mm(Z3, t4), mm(t0, t3))
    return _from13(X3), _from13(Y3), _from13(Z3)


def _add_kernel_rcb13(x1, y1, z1, x2, y2, z2, pp, nn, xo, yo, zo):
    rows = lambda ref: [ref[i, :] for i in range(L)]
    X, Y, Z = _rcb_add_13(rows(x1), rows(y1), rows(z1),
                          rows(x2), rows(y2), rows(z2))
    for i in range(L):
        xo[i, :] = X[i]
        yo[i, :] = Y[i]
        zo[i, :] = Z[i]


def _rcb_add_rows_mm2(x1, y1, z1, x2, y2, z2, pp):
    """RCB complete add over the TENSORIZED-UNROLLED CIOS field ops
    (_mm2/_add2/_sub2): all values stay [L, B] vreg-dense (no [1, B]
    row-list register waste, no MXU dot per product). 12 muls keep the
    fully-unrolled jaxpr ~10k eqns — one-time Mosaic compile, cached."""
    mm = lambda a, b: _mm2(a, b, pp)
    add = lambda a, b: _add2(a, b, pp)
    sub = lambda a, b: _sub2(a, b, pp)
    tri = lambda v: add(add(v, v), v)
    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t2 = mm(z1, z2)
    t3 = mm(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mm(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mm(add(x1, z1), add(x2, z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = tri(t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = tri(Y3)
    X3 = sub(mm(t3, t1), mm(t4, Y3))
    Y3 = add(mm(Y3, t0), mm(t1, Z3))
    Z3 = add(mm(Z3, t4), mm(t0, t3))
    return X3, Y3, Z3


def _add_kernel_rcb_mm2(x1, y1, z1, x2, y2, z2, pp, nn, xo, yo, zo):
    X, Y, Z = _rcb_add_rows_mm2(x1[:, :], y1[:, :], z1[:, :],
                                x2[:, :], y2[:, :], z2[:, :], pp[:, :])
    xo[:, :] = X
    yo[:, :] = Y
    zo[:, :] = Z


def _add_kernel_fw(x1, y1, z1, x2, y2, z2, pp, nn, xo, yo, zo):
    X, Y, Z = _add_rows_fw(x1[:, :], y1[:, :], z1[:, :],
                           x2[:, :], y2[:, :], z2[:, :], pp[:, :], nn[:, :])
    xo[:, :] = X
    yo[:, :] = Y
    zo[:, :] = Z


def _double_kernel_fw(x1, y1, z1, pp, nn, xo, yo, zo):
    X, Y, Z = _double_rows_fw(x1[:, :], y1[:, :], z1[:, :], pp[:, :], nn[:, :])
    xo[:, :] = X
    yo[:, :] = Y
    zo[:, :] = Z


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _add_kernel(x1, y1, z1, x2, y2, z2, pp, xo, yo, zo):
    X, Y, Z = _add_rows(x1[:, :], y1[:, :], z1[:, :],
                        x2[:, :], y2[:, :], z2[:, :], pp[:, :])
    xo[:, :] = X
    yo[:, :] = Y
    zo[:, :] = Z


def _double_kernel(x1, y1, z1, pp, xo, yo, zo):
    # complete: doubling infinity stays infinity (Z3 = 2*Y*Z = 0 when Z=0)
    X, Y, Z = _double_rows(x1[:, :], y1[:, :], z1[:, :], pp[:, :])
    xo[:, :] = X
    yo[:, :] = Y
    zo[:, :] = Z


def _kernel_flavor() -> str:
    import os
    # rcb_cios measures ~11x faster than the fw-field-op rcb at block=1024
    # (the unrolled CIOS keeps everything in vregs; the fw indicator-dot
    # variant round-trips through VMEM) — see ROADMAP perf notes.
    return os.environ.get("SNARKVM_TPU_EC_KERNEL", "rcb_cios")


def _pick_block(B: int) -> int:
    """Largest lane block that divides B. Grid-step dispatch overhead
    dominates below ~512 lanes (in-graph marginal rates on v5e for
    rcb_cios: block 512 -> 39.5, 1024 -> 60.2, 2048 -> 64.1 M adds/s)."""
    for blk in (2048, 1024, 512, 256, 128):
        if B % blk == 0:
            return blk
    return B


@functools.lru_cache(maxsize=None)
def _rcb_cpu_fn():
    """CPU path for the rcb flavor: the formulas are pure jnp — run them
    directly under jit (small graph; no Pallas/Mosaic involved)."""
    return jax.jit(_rcb_add_rows)


@functools.lru_cache(maxsize=None)
def _g1_op(n_in: int, kernel_name: str, block: int, flavor: str = "fw"):
    if flavor.startswith("rcb") and jax.default_backend() == "cpu":
        fn = _rcb_cpu_fn()
        return lambda *args: fn(*args)
    if jax.default_backend() == "cpu":
        return _g1_op_cpu(kernel_name)
    kernel = {
        ("add", "rcb"): _add_kernel_rcb,
        ("add", "rcb_cios"): _add_kernel_rcb_cios,
        ("add", "rcb13"): _add_kernel_rcb13,
        ("add", "rcb_mm2"): _add_kernel_rcb_mm2,
        ("add", "fw"): _add_kernel_fw,
        ("double", "fw"): _double_kernel_fw,
        ("add", "unrolled"): _add_kernel,
        ("double", "unrolled"): _double_kernel,
    }[(kernel_name, flavor)]

    def run(*coords):
        B = coords[0].shape[1]
        grid = (B // block,)
        bs = lambda: pl.BlockSpec((L, block), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs() for _ in range(n_in)],
            out_specs=(bs(), bs(), bs()),
            out_shape=tuple(jax.ShapeDtypeStruct((L, B), jnp.uint32)
                            for _ in range(3)),
        )(*coords)
        return out

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _g1_op_cpu(kernel_name: str):
    """CPU path: same formulas via the rolled row-major ops in ops/ec.py
    (one ~5s XLA compile per width, cached). Interpret-mode Pallas would
    re-lower the 37k-eqn fused kernel, which takes minutes on CPU."""
    from . import ec

    def run(*coords):
        n_pts = 6 if kernel_name == "add" else 3
        t = [c.T for c in coords[:n_pts]]    # drop the constant planes
        if kernel_name == "add":
            p = {"X": t[0], "Y": t[1], "Z": t[2]}
            q = {"X": t[3], "Y": t[4], "Z": t[5]}
            r = ec._g1_add_impl(p, q)
        else:
            r = ec._g1_double_impl({"X": t[0], "Y": t[1], "Z": t[2]})
        return r["X"].T, r["Y"].T, r["Z"].T

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _p_plane_np(B: int):
    col = np.array([int(x) for x in FQ.p_limbs], dtype=np.uint32)
    return np.tile(col[:, None], (1, B))


def _p_plane(B: int):
    return jnp.asarray(_p_plane_np(B))


@functools.lru_cache(maxsize=None)
def _n_plane_np(B: int):
    col = np.array([(_NPRIME >> (BASE_BITS * i)) & int(MASK) for i in range(L)],
                   dtype=np.uint32)
    return np.tile(col[:, None], (1, B))


def _n_plane(B: int):
    return jnp.asarray(_n_plane_np(B))


def g1_add_traced(p, q, block: int | None = None):
    """Complete projective add for use INSIDE an enclosing jit trace (the
    rcb kernel as a raw pallas_call, or the pure-jnp formulas on CPU) —
    lets whole MSM stages fuse into single dispatches."""
    B = p["X"].shape[1]
    if block is None:
        block = _pick_block(B)
    pp, nn = _p_plane(B), _n_plane(B)
    if jax.default_backend() == "cpu":
        x, y, z = _rcb_add_rows(p["X"], p["Y"], p["Z"],
                                q["X"], q["Y"], q["Z"], pp, nn)
        return {"X": x, "Y": y, "Z": z}
    bs = lambda: pl.BlockSpec((L, block), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    flavor = _kernel_flavor()
    kern = _add_kernel_rcb13 if flavor == "rcb13" else _add_kernel_rcb_cios
    x, y, z = pl.pallas_call(
        kern,
        grid=(B // block,),
        in_specs=[bs() for _ in range(8)],
        out_specs=(bs(), bs(), bs()),
        out_shape=tuple(jax.ShapeDtypeStruct((L, B), jnp.uint32)
                        for _ in range(3)),
    )(p["X"], p["Y"], p["Z"], q["X"], q["Y"], q["Z"], pp, nn)
    return {"X": x, "Y": y, "Z": z}


def g1_add_lm(p, q, block: int | None = None):
    """p, q: dicts {"X","Y","Z"} of [L, B] (B % block == 0). Complete add.

    COORDINATE MODEL IS FLAVOR-DEPENDENT: the default "rcb" flavor uses
    homogeneous projective coordinates with identity (0:1:0); the legacy
    "fw"/"unrolled" flavors use Jacobian with identity Z=0."""
    B = p["X"].shape[1]
    if block is None:
        block = _pick_block(B)
    flavor = _kernel_flavor()
    args = [p["X"], p["Y"], p["Z"], q["X"], q["Y"], q["Z"], _p_plane(B)]
    if flavor in ("fw", "rcb", "rcb_cios", "rcb13", "rcb_mm2"):
        args.append(_n_plane(B))
    x, y, z = _g1_op(len(args), "add", block, flavor)(*args)
    return {"X": x, "Y": y, "Z": z}


def g1_double_lm(p, block: int | None = None):
    flavor = _kernel_flavor()
    if flavor.startswith("rcb"):
        return g1_add_lm(p, p, block)        # complete: doubling is the same kernel
    B = p["X"].shape[1]
    if block is None:
        block = _pick_block(B)
    args = [p["X"], p["Y"], p["Z"], _p_plane(B)]
    if flavor == "fw":
        args.append(_n_plane(B))
    x, y, z = _g1_op(len(args), "double", block, flavor)(*args)
    return {"X": x, "Y": y, "Z": z}


# ---------------------------------------------------------------------------
# Host <-> limb-major conversion
# ---------------------------------------------------------------------------

def _int_to_col(v: int) -> np.ndarray:
    return np.array([(v >> (BASE_BITS * i)) & int(MASK) for i in range(L)],
                    dtype=np.uint32)


def g1_from_affine_lm(points):
    """points: list of (x, y) canonical ints or None -> limb-major dict,
    lanes padded to a multiple of LANE with the identity. Identity lanes
    are written as (0, 1, 0) — correct for the projective (rcb) model and
    harmless for the Jacobian flavors (which key on Z == 0)."""
    n = len(points)
    B = max(LANE, ((n + LANE - 1) // LANE) * LANE)
    one_m = _int_to_col(FQ.R % P.Q)
    X = np.zeros((L, B), dtype=np.uint32)
    Y = np.tile(one_m[:, None], (1, B))
    Z = np.zeros((L, B), dtype=np.uint32)
    for i, pt in enumerate(points):
        if pt is None:
            continue
        X[:, i] = _int_to_col(pt[0] * FQ.R % P.Q)
        Y[:, i] = _int_to_col(pt[1] * FQ.R % P.Q)
        Z[:, i] = one_m
    return {"X": jnp.asarray(X), "Y": jnp.asarray(Y), "Z": jnp.asarray(Z)}


def g1_from_affine_lm_fast(points, pad_to: int | None = None):
    """Vectorized version of g1_from_affine_lm for LARGE fixed base sets
    (SRS uploads): bulk bytes packing instead of per-limb Python loops.
    points: list of (x, y) canonical ints or None."""
    n = len(points)
    B = pad_to or max(LANE, ((n + LANE - 1) // LANE) * LANE)
    one = FQ.R % P.Q
    xs = bytearray()
    ys = bytearray()
    zs = bytearray()
    one_b = one.to_bytes(48, "little")
    zero_b = bytes(48)
    for pt in points:
        if pt is None:
            xs += zero_b
            ys += one_b
            zs += zero_b
        else:
            xs += (pt[0] * FQ.R % P.Q).to_bytes(48, "little")
            ys += (pt[1] * FQ.R % P.Q).to_bytes(48, "little")
            zs += one_b
    pad = B - n
    if pad:
        xs += zero_b * pad
        ys += one_b * pad
        zs += zero_b * pad
    out = {}
    for k, buf in (("X", xs), ("Y", ys), ("Z", zs)):
        arr = np.frombuffer(bytes(buf), dtype=np.uint16).reshape(B, L)
        out[k] = jnp.asarray(np.ascontiguousarray(arr.T).astype(np.uint32))
    return out


def scalars_to_limbs(scalars):
    """[n] canonical Fr ints -> [n, 16] uint32 limb rows (fast packing)."""
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    arr = np.frombuffer(buf, dtype=np.uint16).reshape(len(scalars), 16)
    return jnp.asarray(arr.astype(np.uint32))


def _col_to_int(col) -> int:
    v = 0
    for i in range(L):
        v |= int(col[i]) << (BASE_BITS * i)
    return v


def g1_lm_to_jac_ints(p):
    """[L, B] dict -> list of (X, Y, Z) canonical int JACOBIAN tuples.
    Under the rcb flavor the planes are homogeneous projective; they are
    mapped to the Jacobian representative (X*Z, Y*Z^2, Z)."""
    Rinv = pow(FQ.R, -1, P.Q)
    X = np.asarray(p["X"])
    Y = np.asarray(p["Y"])
    Z = np.asarray(p["Z"])
    proj = _kernel_flavor().startswith("rcb")
    out = []
    for i in range(X.shape[1]):
        x = _col_to_int(X[:, i]) * Rinv % P.Q
        y = _col_to_int(Y[:, i]) * Rinv % P.Q
        z = _col_to_int(Z[:, i]) * Rinv % P.Q
        if proj and z != 0:
            out.append((x * z % P.Q, y * z * z % P.Q, z))
        elif proj:
            out.append((0, 1, 0))
        else:
            out.append((x, y, z))
    return out


@functools.lru_cache(maxsize=None)
def _one_plane_np(B: int):
    return np.tile(_int_to_col(FQ.R % P.Q)[:, None], (1, B))


def _identity_lm(B: int):
    return {"X": jnp.zeros((L, B), jnp.uint32),
            "Y": jnp.asarray(_one_plane_np(B)),
            "Z": jnp.zeros((L, B), jnp.uint32)}


def _mask_identity(p, keep):
    """keep: [B] bool — lanes where keep is False become the identity."""
    k = keep[None, :]
    B = p["X"].shape[1]
    return {"X": jnp.where(k, p["X"], 0),
            "Y": jnp.where(k, p["Y"], jnp.asarray(_one_plane_np(B))),
            "Z": jnp.where(k, p["Z"], 0)}


# ---------------------------------------------------------------------------
# MSM
# ---------------------------------------------------------------------------

def _gather_lanes(p, idx):
    return {k: jnp.take(v, idx, axis=1) for k, v in p.items()}


def _neg_lm(p):
    """-P: Y -> p - Y (maps 0 -> 0, so infinity stays canonical)."""
    B = p["Y"].shape[1]
    return {"X": p["X"],
            "Y": _sub2(jnp.zeros_like(p["Y"]), p["Y"], _p_plane(B)),
            "Z": p["Z"]}


def _shift_lanes_right(p, d):
    """Shift lanes right by d; vacated lanes become the identity."""
    B = p["X"].shape[1]
    lanes = jnp.arange(B) >= d
    shifted = {k: jnp.pad(v, ((0, 0), (d, 0)))[:, :B] for k, v in p.items()}
    return _mask_identity(shifted, lanes)


def _prefix_scan_lm(p, n):
    """Hillis-Steele inclusive scan of EC adds over the first n lanes
    (lanes >= n must be identity; they stay harmless)."""
    d = 1
    while d < n:
        p = g1_add_lm(p, _shift_lanes_right(p, d))
        d <<= 1
    return p


def _extract_digits_lm(scalar_limbs, window, c):
    from .msm import _extract_digits
    return _extract_digits(scalar_limbs, window, c)




def _msm_prep_raw(W: int, c: int, n: int, B: int, nb: int, nb_pad: int):
    """Window prep body: digits for all windows, per-window sort, bucket
    run starts/counts, and the global round count."""

    def run(slimbs):
        bucket_ids = jnp.arange(nb, dtype=jnp.int32)
        digs = jnp.stack([_extract_digits_lm(slimbs, w, c)
                          for w in range(W)])                     # [W, n]
        # bucket 0 contributes nothing: retire its points with the pads
        digs = jnp.where(digs == 0, nb, digs)
        digs = jnp.concatenate(
            [digs, jnp.full((W, B - n), nb, jnp.int32)], axis=1)  # [W, B]
        order = jnp.argsort(digs, axis=1)                          # [W, B]
        sorted_digits = jnp.take_along_axis(digs, order, axis=1)
        start = jax.vmap(lambda sd: jnp.searchsorted(
            sd, bucket_ids, side="left"))(sorted_digits)
        end = jax.vmap(lambda sd: jnp.searchsorted(
            sd, bucket_ids, side="right"))(sorted_digits)
        counts = end - start                                       # [W, nb]
        startp = jnp.pad(start, ((0, 0), (0, nb_pad - nb)))
        countsp = jnp.pad(counts, ((0, 0), (0, nb_pad - nb)))
        return order, startp, countsp, jnp.max(counts)

    return run


@functools.lru_cache(maxsize=None)
def _msm_prep_fn(W: int, c: int, n: int, B: int, nb: int, nb_pad: int):
    return jax.jit(_msm_prep_raw(W, c, n, B, nb, nb_pad))


def _msm_accum_raw(W: int, nb: int, nb_pad: int, B: int, c: int,
                   num_bits: int = 253, block: int | None = None):
    """Jitted bucket accumulation with REPLICATED buckets: window w only
    uses nb_w = 2^(window bit width) buckets; the remaining lanes of its
    segment hold R_w = nb_pad/nb_w round-robin replicas per bucket, so a
    narrow top window (e.g. 6 bits of a 253-bit scalar) no longer forces
    max-bucket-count serial rounds. Replicas tree-reduce in log2(R) masked
    adds; bucket b of window w ends at lane w*nb_pad + b*R_w and a static
    regather restores the contiguous [W, nb_pad] bucket layout. One
    dispatch; the round bound is traced (no host sync)."""
    lanes = W * nb_pad

    # static per-lane maps (numpy -> baked constants)
    b_of = np.zeros(lanes, np.int32)      # bucket index within the window
    r_of = np.zeros(lanes, np.int32)      # replica index within the bucket
    R_of = np.zeros(lanes, np.int32)      # replica count for this window
    regather = np.zeros(lanes, np.int32)  # bucket-major lane -> replica-0 lane
    live = np.zeros(lanes, bool)          # lane participates at all
    nb_ws = []
    for w in range(W):
        width = min(c, num_bits - c * w)
        nb_w = min(nb, 1 << width)
        nb_ws.append(nb_w)
        R_w = nb_pad // nb_w
        base_lane = w * nb_pad
        for i in range(nb_pad):
            b_of[base_lane + i] = i // R_w
            r_of[base_lane + i] = i % R_w
            R_of[base_lane + i] = R_w
            live[base_lane + i] = True
        for b in range(nb_pad):
            regather[base_lane + b] = base_lane + (b * R_w if b < nb_w else 0)
    flat_wb = (np.arange(lanes) // nb_pad) * nb + b_of   # index into [W*nb]
    regather_valid = np.concatenate(
        [np.arange(nb_pad) < nb_ws[w] for w in range(W)])

    def run(pX, pY, pZ, order, startp, countsp, rounds_unused):
        points = {"X": pX, "Y": pY, "Z": pZ}
        ident = _identity_lm(lanes)
        start_l = jnp.take(startp[:, :nb].reshape(W * nb), jnp.asarray(flat_wb))
        count_l = jnp.take(countsp[:, :nb].reshape(W * nb), jnp.asarray(flat_wb))
        r_ofj = jnp.asarray(r_of)
        R_ofj = jnp.asarray(R_of)
        # per-lane rounds = ceil((count - r)/R); global bound is the max
        lane_rounds = jnp.maximum(count_l - r_ofj + R_ofj - 1, 0) // R_ofj
        rounds = jnp.max(lane_rounds)

        def body(t, acc):
            k = r_ofj + t * R_ofj
            valid = k < count_l
            sel = jnp.clip(start_l + k, 0, B - 1).reshape(W, nb_pad)
            src = jnp.take_along_axis(order, sel, axis=1).reshape(lanes)
            gathered = _mask_identity(_gather_lanes(points, src), valid)
            out = g1_add_traced(
                {"X": acc[0], "Y": acc[1], "Z": acc[2]}, gathered, block)
            return (out["X"], out["Y"], out["Z"])

        acc = jax.lax.fori_loop(
            0, rounds, body, (ident["X"], ident["Y"], ident["Z"]))
        acc = {"X": acc[0], "Y": acc[1], "Z": acc[2]}
        # replica tree-reduce, bottom-up: fold replica j+s into j for
        # s = 1, 2, ..., maxR/2 (j aligned to 2s). ONE fori body (one
        # Mosaic kernel instance) with a traced shift: dozens of unrolled
        # pallas_call instances would each pay a separate slow Mosaic
        # compile over the remote-TPU tunnel.
        max_R = int(np.max(R_of)) if lanes else 1
        if max_R > 1:
            R_ofj2 = jnp.asarray(R_of)
            r_ofj2 = jnp.asarray(r_of)

            def fold_body(t, acc3):
                s = jnp.int32(1) << t
                recv = (R_ofj2 > s) & ((r_ofj2 & (2 * s - 1)) == 0)
                cur = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}
                right = {k: jnp.roll(v, -s, axis=1) for k, v in cur.items()}
                right = _mask_identity(right, recv)
                out = g1_add_traced(cur, right, block)
                return (out["X"], out["Y"], out["Z"])

            acc3 = jax.lax.fori_loop(
                0, max_R.bit_length() - 1, fold_body,
                (acc["X"], acc["Y"], acc["Z"]))
            acc = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}
        # regather buckets to the contiguous layout; dead slots -> identity
        acc = _gather_lanes(acc, jnp.asarray(regather))
        acc = _mask_identity(acc, jnp.asarray(regather_valid))
        return acc["X"], acc["Y"], acc["Z"]

    return run


@functools.lru_cache(maxsize=None)
def _msm_accum_fn(W: int, nb: int, nb_pad: int, B: int, c: int,
                  num_bits: int = 253, block: int | None = None):
    return jax.jit(_msm_accum_raw(W, nb, nb_pad, B, c, num_bits, block))


def _replica_maps(W: int, c: int, nb: int, nb_pad: int, num_bits: int):
    """Static per-lane replica maps shared by the accumulation schedules."""
    lanes = W * nb_pad
    b_of = np.zeros(lanes, np.int32)
    r_of = np.zeros(lanes, np.int32)
    R_of = np.zeros(lanes, np.int32)
    regather = np.zeros(lanes, np.int32)
    nb_ws = []
    for w in range(W):
        width = min(c, num_bits - c * w)
        nb_w = min(nb, 1 << width)
        nb_ws.append(nb_w)
        R_w = nb_pad // nb_w
        base = w * nb_pad
        for i in range(nb_pad):
            b_of[base + i] = i // R_w
            r_of[base + i] = i % R_w
            R_of[base + i] = R_w
        for b in range(nb_pad):
            regather[base + b] = base + (b * R_w if b < nb_w else 0)
    flat_wb = (np.arange(lanes) // nb_pad) * nb + b_of
    regather_valid = np.concatenate(
        [np.arange(nb_pad) < nb_ws[w] for w in range(W)])
    return b_of, r_of, R_of, regather, regather_valid, flat_wb, nb_ws


def _msm_dense_raw(W: int, c: int, n: int, B: int, nb: int, nb_pad: int,
                   num_bits: int = 253, block: int | None = None,
                   k: int = 1):
    """Gather-free accumulation: the DENSE DESCENDING-COUNT schedule.

    After the per-window digit sort, each point gets a (virtual bucket,
    rank) slot — virtual buckets are the round-robin replicas of
    _msm_accum_raw. Virtual buckets are then RELABELED in descending
    count order, and points are re-sorted by (rank, label). In that
    order, round t's points occupy ONE CONTIGUOUS SLICE per window
    [off_t, off_t + m_t) whose position within the slice IS the bucket's
    accumulator lane — so the accumulation loop does a block dynamic-
    slice per window (sequential DMA) instead of a per-round lane gather
    (the gather cost measured equal to the EC add itself). Points are
    materialized once in schedule order (one big gather), all windows at
    once."""
    # k > 1 batches k scalar sets over the SAME points in one pipeline:
    # the k*W windows are scheduled/reduced together (one dispatch for a
    # whole commit round)
    Wt = k * W
    lanes = Wt * nb_pad
    b_of0, r_of0, R_of0, regather0, regather_valid0, flat_wb0, nb_ws = \
        _replica_maps(W, c, nb, nb_pad, num_bits)
    b_of = np.tile(b_of0, k)
    r_of = np.tile(r_of0, k)
    R_of = np.tile(R_of0, k)
    regather = np.concatenate(
        [regather0 + s * W * nb_pad for s in range(k)])
    regather_valid = np.tile(regather_valid0, k)
    flat_wb = np.concatenate([flat_wb0 + s * W * nb for s in range(k)])
    Rw_arr = np.tile(np.asarray(
        [nb_pad // nb_ws[w] for w in range(W)],
        np.int32)[:, None], (k, 1))                           # [Wt, 1]

    def run(pX, pY, pZ, slimbs):
        points = {"X": pX, "Y": pY, "Z": pZ}
        bucket_ids = jnp.arange(nb, dtype=jnp.int32)
        digs = jnp.stack(
            [_extract_digits_lm(slimbs if k == 1 else slimbs[s], w, c)
             for s in range(k) for w in range(W)])            # [Wt, n]
        digs = jnp.where(digs == 0, nb, digs)
        digs = jnp.concatenate(
            [digs, jnp.full((Wt, B - n), nb, jnp.int32)], axis=1)  # [Wt, B]
        order = jnp.argsort(digs, axis=1)
        sorted_digits = jnp.take_along_axis(digs, order, axis=1)
        start = jax.vmap(lambda sd: jnp.searchsorted(
            sd, bucket_ids, side="left"))(sorted_digits)      # [W, nb]
        end = jax.vmap(lambda sd: jnp.searchsorted(
            sd, bucket_ids, side="right"))(sorted_digits)
        counts = end - start                                  # [W, nb]

        # per sorted position: bucket, rank within bucket, replica slot
        trash = sorted_digits >= nb
        d_safe = jnp.minimum(sorted_digits, nb - 1)
        start_of_pos = jnp.take_along_axis(start, d_safe, axis=1)
        rank = jnp.arange(B)[None, :] - start_of_pos          # [Wt, B]
        vb = jnp.minimum(d_safe * Rw_arr + (rank % Rw_arr),
                         nb_pad - 1)                          # virtual bucket
        vk = jnp.where(trash, B, rank // Rw_arr)              # virtual rank

        # per-virtual-bucket counts (= per-lane round counts), flattened
        # over ALL windows: the schedule is GLOBAL so that each round is
        # one scalar-offset dynamic slice (sequential DMA), not a per-
        # window vmapped slice
        count_l = jnp.take(counts.reshape(Wt * nb), jnp.asarray(flat_wb))
        counts_v = (jnp.maximum(count_l - jnp.asarray(r_of), 0)
                    + jnp.asarray(R_of) - 1) // jnp.asarray(R_of)  # [lanes]

        # relabel ALL virtual buckets in descending-count order; the
        # accumulator lane of a virtual bucket is its global desc rank
        ordv = jnp.argsort(-counts_v)                         # rank -> vb
        inv_ordv = jnp.argsort(ordv)                          # vb -> rank
        gvb = (jnp.arange(Wt)[:, None] * nb_pad + vb)         # [Wt, B]
        glabel = jnp.take(inv_ordv, gvb)                      # [W, B]

        # schedule order: sort the FLAT point list by (virtual rank,
        # global label); carry the original point index as payload (two
        # int32 keys — a fused key can overflow int32 at large B)
        _, _, sched_idx = jax.lax.sort(
            (vk.reshape(Wt * B), glabel.reshape(Wt * B),
             order.reshape(Wt * B)),
            dimension=0, num_keys=2)
        idx2 = jnp.concatenate([sched_idx, jnp.zeros(lanes, jnp.int32)])
        sorted_pts = {kk: jnp.take(v, idx2, axis=1)           # [L, W*B+lanes]
                      for kk, v in points.items()}

        rounds = jnp.max(counts_v)
        ident = _identity_lm(lanes)
        lane_ids = jnp.arange(lanes)

        def body(t, acc3):
            off = jnp.sum(jnp.minimum(counts_v, t))           # scalar
            m = jnp.sum(counts_v > t)                         # scalar
            chunk = {
                kk: jax.lax.dynamic_slice(v, (0, off), (L, lanes))
                for kk, v in sorted_pts.items()}
            gathered = _mask_identity(chunk, lane_ids < m)
            cur = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}
            out = g1_add_traced(cur, gathered, block)
            return (out["X"], out["Y"], out["Z"])

        # two-phase tail: active virtual buckets are a PREFIX of the
        # accumulator lanes (descending-count relabel), and m_t shrinks
        # monotonically — once at most w2 lanes are active (t >= the
        # (w2+1)-th largest count), rounds run at width w2 instead of
        # paying full-lane adds for a nearly-empty schedule tail
        w2 = min(lanes, max(nb_pad, 2048))
        if w2 < lanes:
            counts_desc = jnp.take(counts_v, ordv)
            t_switch = jnp.minimum(counts_desc[w2], rounds)
            lane_ids2 = jnp.arange(w2)

            def body_tail(t, acc3):
                off = jnp.sum(jnp.minimum(counts_v, t))
                m = jnp.sum(counts_v > t)
                cur = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}
                head = {kk: v[:, :w2] for kk, v in cur.items()}
                chunk = {
                    kk: jax.lax.dynamic_slice(v, (0, off), (L, w2))
                    for kk, v in sorted_pts.items()}
                gathered = _mask_identity(chunk, lane_ids2 < m)
                out = g1_add_traced(head, gathered, block)
                return tuple(
                    jax.lax.dynamic_update_slice(full, out[kk], (0, 0))
                    for full, kk in zip(acc3, ("X", "Y", "Z")))
        else:
            t_switch = rounds
            body_tail = body

        acc3 = jax.lax.fori_loop(
            0, t_switch, body, (ident["X"], ident["Y"], ident["Z"]))
        acc3 = jax.lax.fori_loop(t_switch, rounds, body_tail, acc3)
        acc = {"X": acc3[0], "Y": acc3[1], "Z": acc3[2]}

        # un-permute: accumulator lane j holds virtual bucket ordv[j];
        # restore (w, vb) lane layout with one traced gather
        acc = _gather_lanes(acc, inv_ordv)

        # replica tree-reduce (same as _msm_accum_raw)
        max_R = int(np.max(R_of)) if lanes else 1
        if max_R > 1:
            R_ofj = jnp.asarray(R_of)
            r_ofj = jnp.asarray(r_of)

            def fold_body(t, a3):
                s = jnp.int32(1) << t
                recv = (R_ofj > s) & ((r_ofj & (2 * s - 1)) == 0)
                cur = {"X": a3[0], "Y": a3[1], "Z": a3[2]}
                right = {kk: jnp.roll(v, -s, axis=1) for kk, v in cur.items()}
                right = _mask_identity(right, recv)
                out = g1_add_traced(cur, right, block)
                return (out["X"], out["Y"], out["Z"])

            a3 = jax.lax.fori_loop(0, max_R.bit_length() - 1, fold_body,
                                   (acc["X"], acc["Y"], acc["Z"]))
            acc = {"X": a3[0], "Y": a3[1], "Z": a3[2]}
        acc = _gather_lanes(acc, jnp.asarray(regather))
        acc = _mask_identity(acc, jnp.asarray(regather_valid))
        return acc["X"], acc["Y"], acc["Z"]

    return run


@functools.lru_cache(maxsize=None)
def _msm_full_dense_fn(W: int, c: int, n: int, B: int, nb: int, nb_pad: int,
                       num_bits: int = 253, block: int | None = None,
                       k: int = 1):
    """Dense-schedule MSM pipeline as ONE jit (prep+accum+suffix).
    k > 1: k scalar sets over the same points (slimbs [k, n, 16])."""
    dense = _msm_dense_raw(W, c, n, B, nb, nb_pad, num_bits, block, k)
    suffix = _msm_suffix_raw(k * W, nb, nb_pad, block)

    def run(pX, pY, pZ, slimbs):
        acc = dense(pX, pY, pZ, slimbs)
        sums = suffix(*acc)
        sums = _pad_lanes(sums, LANE)
        return sums["X"], sums["Y"], sums["Z"]

    return jax.jit(run)


def _msm_suffix_raw(W: int, nb: int, nb_pad: int, block: int | None = None):
    """Segmented suffix-sum + tree-reduce body: window totals at the
    head lane of each segment, gathered to [W] lanes. Both phases run as
    fori loops with traced shifts (one Mosaic kernel instance each, not
    one per unrolled step — each extra pallas_call instance costs a slow
    separate Mosaic compile over the remote-TPU tunnel)."""
    lanes = W * nb_pad

    def run(aX, aY, aZ):
        acc = {"X": aX, "Y": aY, "Z": aZ}
        lane_ids = jnp.arange(nb_pad)
        seg_ids = jnp.tile(lane_ids, W)
        # rev[w, j] = bucket_{nb-1-j} of window w
        rev_sel = jnp.where(lane_ids < nb - 1, nb - 1 - lane_ids, 0)
        rev_src = (jnp.arange(W)[:, None] * nb_pad
                   + rev_sel[None, :]).reshape(lanes)
        rev = _mask_identity(_gather_lanes(acc, rev_src),
                             jnp.tile(lane_ids < nb - 1, W))

        # segmented Hillis-Steele prefix scan over the first nb-1 lanes
        def scan_body(t, a3):
            d = jnp.int32(1) << t
            cur = {"X": a3[0], "Y": a3[1], "Z": a3[2]}
            sh = {k: jnp.roll(v, d, axis=1) for k, v in cur.items()}
            sh = _mask_identity(sh, seg_ids >= d)
            out = g1_add_traced(cur, sh, block)
            return (out["X"], out["Y"], out["Z"])

        steps = max(0, (nb - 2)).bit_length()      # d = 1..2^(steps-1) < nb-1
        r3 = jax.lax.fori_loop(0, steps, scan_body,
                               (rev["X"], rev["Y"], rev["Z"]))
        rev = {"X": r3[0], "Y": r3[1], "Z": r3[2]}
        rev = _mask_identity(rev, jnp.tile(lane_ids < nb - 1, W))

        # segmented tree-reduce of each window's nb_pad lanes into lane 0
        def red_body(t, a3):
            size = jnp.int32(nb_pad) >> t
            half = size >> 1
            cur = {"X": a3[0], "Y": a3[1], "Z": a3[2]}
            sh = {k: jnp.roll(v, -half, axis=1) for k, v in cur.items()}
            sh = _mask_identity(sh, seg_ids < (size - half))
            out = g1_add_traced(cur, sh, block)
            return (out["X"], out["Y"], out["Z"])

        r3 = jax.lax.fori_loop(0, nb_pad.bit_length() - 1, red_body,
                               (rev["X"], rev["Y"], rev["Z"]))
        rev = {"X": r3[0], "Y": r3[1], "Z": r3[2]}
        heads = jnp.arange(W) * nb_pad
        return _gather_lanes(rev, heads)                           # [W] lanes

    return run


@functools.lru_cache(maxsize=None)
def _msm_suffix_fn(W: int, nb: int, nb_pad: int, block: int | None = None):
    return jax.jit(_msm_suffix_raw(W, nb, nb_pad, block))


@functools.lru_cache(maxsize=None)
def _msm_full_fn(W: int, c: int, n: int, B: int, nb: int, nb_pad: int,
                 num_bits: int = 253, block: int | None = None):
    """The whole device MSM pipeline (prep -> bucket accumulation ->
    weighted reduction -> LANE-padded window sums) as ONE jit: one tunnel
    dispatch, one XLA compile, and XLA fuses the inter-stage glue."""
    prep = _msm_prep_raw(W, c, n, B, nb, nb_pad)
    accum = _msm_accum_raw(W, nb, nb_pad, B, c, num_bits, block)
    suffix = _msm_suffix_raw(W, nb, nb_pad, block)

    def run(pX, pY, pZ, slimbs):
        order, startp, countsp, rounds = prep(slimbs)
        acc = accum(pX, pY, pZ, order, startp, countsp, rounds)
        sums = suffix(*acc)                                # [W] lanes
        sums = _pad_lanes(sums, LANE)
        return sums["X"], sums["Y"], sums["Z"]

    return jax.jit(run)


def _suffix_window_total(buckets, nb: int, nb_pad: int):
    """Window total sum_b b * bucket_b from bucket-sum lanes. Drop bucket
    0; reverse the remaining nb-1 buckets; a prefix scan of the reversed
    buckets yields the suffix sums T_k, and sum_k T_k = the total."""
    rev = {k: v[:, 1:nb][:, ::-1] for k, v in buckets.items()}
    rev = _pad_lanes(rev, nb_pad)
    suffix = _prefix_scan_lm(rev, nb - 1)
    # identity out lanes >= nb-1 (scan smeared values into the padding)
    suffix = _mask_identity(suffix, jnp.arange(nb_pad) < nb - 1)
    total = _reduce_lanes(suffix, nb_pad)                   # lane 0
    return {k: v[:, :1] for k, v in total.items()}

def msm_g1_lm(points_lm, scalar_limbs, n: int, c: int | None = None,
              num_bits: int = 253, method: str | None = None):
    """Pippenger over Pallas kernels. points_lm: limb-major dict (lanes
    padded past n with infinity); scalar_limbs: canonical Fr limbs [n, 16]
    uint32 (row-major). Returns the host Jacobian int tuple.

    method="rounds" (default): lanes = buckets; after the per-window sort,
    bucket b's points form a contiguous run [start_b, end_b) and round t
    adds sorted_point[start_b + t] into bucket-lane b (masked past the
    run) — total EC work ~= max_bucket_count * nb per window, i.e. O(n)
    like the reference's batched.rs, instead of the O(n log n) of
    method="scan" (Hillis-Steele prefix scan over all lanes)."""
    import os
    from .msm import device_window
    from ..curves import sw_fast as g1f

    if method is None:
        method = os.environ.get("SNARKVM_TPU_MSM_METHOD", "dense")
    B = points_lm["X"].shape[1]
    if c is None:
        c = int(os.environ.get("SNARKVM_TPU_MSM_C", "0")) or device_window(n)
    windows = (num_bits + c - 1) // c
    nb = 1 << c
    nb_pad = max(LANE, ((nb + LANE - 1) // LANE) * LANE)

    def window_sums_rounds(points, slimbs):
        """ALL windows at once: lanes = windows x nb_pad bucket segments,
        with the whole pipeline (prep sort, bucket-accumulation fori with
        the Pallas add inlined, segmented suffix/reduce) fused into ONE
        jitted dispatch — per-call tunnel latency otherwise dominates.
        The fused "dense" schedule is the default on every backend;
        method="rounds" selects the eager per-round CPU loop (small XLA
        compiles, one dispatch per round — useful when compile time
        matters more than dispatch overhead)."""
        if method == "dense" or jax.default_backend() != "cpu":
            # "dense" = gather-free descending-count schedule (default);
            # "gather" = per-round lane-gather schedule (kept for A/B)
            mk = _msm_full_fn if method == "gather" else _msm_full_dense_fn
            full = mk(windows, c, n, B, nb, nb_pad, num_bits)
            sX, sY, sZ = full(points["X"], points["Y"], points["Z"], slimbs)
            return {"X": sX, "Y": sY, "Z": sZ}
        prep = _msm_prep_fn(windows, c, n, B, nb, nb_pad)
        order, startp, countsp, rounds = prep(slimbs)
        rounds = int(np.asarray(rounds))
        lanes = windows * nb_pad
        acc = _identity_lm(lanes)
        for t in range(rounds):
            valid = (countsp > t).reshape(lanes)
            sel = jnp.clip(startp + t, 0, B - 1)
            src = jnp.take_along_axis(order, sel, axis=1).reshape(lanes)
            gathered = _mask_identity(_gather_lanes(points, src), valid)
            acc = g1_add_lm(acc, gathered)
        heads = []
        for w in range(windows):
            seg = {k: v[:, w * nb_pad : (w + 1) * nb_pad]
                   for k, v in acc.items()}
            heads.append(_suffix_window_total(seg, nb, nb_pad))
        return {k: jnp.concatenate([h[k] for h in heads], axis=1)
                for k in ("X", "Y", "Z")}

    def window_sums_fn(points, slimbs):
        # eager driver: every EC op below is a fixed-width jitted kernel
        # (widths B and nb_pad only), so everything hits the op cache and
        # no monolithic MSM graph is ever compiled
        outs = []
        for w in range(windows):
            digits = _extract_digits_lm(slimbs, w, c)          # [n]
            # pad-lane digits sort to the end (nb), never collide with real
            digits_full = jnp.concatenate(
                [digits, jnp.full((B - n,), nb, jnp.int32)])
            order = jnp.argsort(digits_full)
            sorted_digits = jnp.take(digits_full, order)
            sp = _gather_lanes(points, order)
            prefix = _prefix_scan_lm(sp, B)
            boundary = jnp.searchsorted(
                sorted_digits, jnp.arange(nb, dtype=jnp.int32), side="right") - 1
            has_any = boundary >= 0
            safe = jnp.maximum(boundary, 0)
            S = _gather_lanes(prefix, safe)                     # [nb]
            S = _mask_identity(S, has_any)
            # S_prev: shift right one lane; lane 0 becomes identity
            Sp = _shift_lanes_right(S, 1)
            buckets = g1_add_lm(_pad_lanes(S, nb_pad),
                                _neg_lm(_pad_lanes(Sp, nb_pad)))
            outs.append(_suffix_window_total(buckets, nb, nb_pad))
        return {k: jnp.concatenate([o[k] for o in outs], axis=1)
                for k in ("X", "Y", "Z")}

    window_fn = window_sums_fn if method == "scan" else window_sums_rounds
    sums = _pad_lanes(window_fn(points_lm, scalar_limbs), LANE)
    jacs = g1_lm_to_jac_ints(sums)[:windows]
    return _combine_windows(jacs, c)


def _combine_windows(jacs, c: int):
    """Horner combine of per-window sums on host ints (tiny work)."""
    from ..curves import sw_fast as g1f
    total = None
    for w in range(len(jacs) - 1, -1, -1):
        if total is not None:
            for _ in range(c):
                total = g1f.jac_double(total)
        wsum = jacs[w]
        if wsum[2] != 0:
            total = wsum if total is None else g1f.jac_add(total, wsum)
    return total if total is not None else (0, 1, 0)


def msm_g1_lm_multi(points_lm, scalar_sets, n: int, c: int | None = None,
                    num_bits: int = 253):
    """k MSMs over the SAME base points in ONE fused dispatch (the batch-
    commit shape: several polynomials against one SRS window). scalar_sets:
    [k, n, 16] canonical Fr limb rows (or a list of [n, 16] arrays).
    Returns k host Jacobian tuples."""
    import os
    from .msm import device_window

    if not isinstance(scalar_sets, jnp.ndarray):
        scalar_sets = jnp.stack(list(scalar_sets))
    k = scalar_sets.shape[0]
    if k == 1:
        return [msm_g1_lm(points_lm, scalar_sets[0], n, c, num_bits)]
    B = points_lm["X"].shape[1]
    if c is None:
        c = int(os.environ.get("SNARKVM_TPU_MSM_C", "0")) or device_window(n)
    windows = (num_bits + c - 1) // c
    nb = 1 << c
    nb_pad = max(LANE, ((nb + LANE - 1) // LANE) * LANE)
    full = _msm_full_dense_fn(windows, c, n, B, nb, nb_pad, num_bits, None, k)
    sX, sY, sZ = full(points_lm["X"], points_lm["Y"], points_lm["Z"],
                      scalar_sets)
    sums = _pad_lanes({"X": sX, "Y": sY, "Z": sZ}, LANE)
    jacs = g1_lm_to_jac_ints(sums)[:k * windows]
    return [_combine_windows(jacs[s * windows:(s + 1) * windows], c)
            for s in range(k)]


def _pad_lanes(p, B):
    cur = p["X"].shape[1]
    if cur >= B:
        return p
    padded = {k: jnp.pad(v, ((0, 0), (0, B - cur))) for k, v in p.items()}
    return _mask_identity(padded, jnp.arange(B) < cur)


def _reduce_lanes(p, B):
    """Tree-sum all lanes into lane 0 (lanes past the data must be
    identity). log2(B) pallas adds at fixed width B."""
    size = B
    while size > 1:
        half = size // 2
        right = {k: jnp.pad(v[:, half:size], ((0, 0), (0, B - (size - half))))
                 for k, v in p.items()}
        right = _mask_identity(right, jnp.arange(B) < (size - half))
        p = g1_add_lm(p, right)
        size = half
    return p
