"""Batched big-field arithmetic for TPU: multi-limb planes in JAX.

Design (TPU-first, see SURVEY.md §7 Phase 0):
  * A field element is 16-bit limbs stored little-endian in uint32 lanes:
    Fr (253-bit) -> 16 limbs, Fq (377-bit) -> 24 limbs. Shape [..., L].
  * Montgomery form with R = 2^(16·L) — same R as the reference's 64-bit
    limb representation (fields/src/fp_256.rs:52, fp_384.rs), so Montgomery
    residues agree with the reference bit-for-bit.
  * Products of 16-bit limbs fit exactly in uint32; schoolbook column sums
    accumulate ≤ 2·L terms < 2^22 and REDC adds ≤ 2·L more < 2^23 — no
    64-bit integers anywhere (TPUs have no native u64).
  * Lazy-carry REDC with one interleaved carry per reduction step.

Compile-time discipline: carry chains are lax.scan, the REDC loop is a
lax.fori_loop, and column accumulation is a one-hot matmul — so one
Montgomery multiply is ~10^2 HLO ops, not 10^3, and the big consumers
(NTT stages, EC adds inside MSM scans) stay compilable. Public ops are
jitted with the field spec static.

Behavioral parity: fields/src/fp_256.rs mont_reduce (fp_256.rs:69,285) and
utilities/src/biginteger carry chains (mod.rs:102-142), re-derived for
16-bit lanes.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..params import bls12_377 as P

BASE_BITS = 16
MASK = (1 << BASE_BITS) - 1


def int_to_limbs_py(v: int, L: int) -> np.ndarray:
    return np.array([(v >> (BASE_BITS * i)) & MASK for i in range(L)], dtype=np.uint32)


def limbs_to_int_py(a) -> int:
    a = np.asarray(a)
    return sum(int(x) << (BASE_BITS * i) for i, x in enumerate(a.tolist()))


class FpSpec:
    """Static per-field constants (hashed by identity; singletons only)."""

    def __init__(self, modulus: int, name: str):
        self.p = modulus
        self.name = name
        self.L = (modulus.bit_length() + BASE_BITS - 1) // BASE_BITS
        self.R = 1 << (BASE_BITS * self.L)
        self.R2 = self.R * self.R % modulus
        self.n0 = (-pow(modulus, -1, 1 << BASE_BITS)) % (1 << BASE_BITS)
        self.p_limbs = int_to_limbs_py(modulus, self.L)
        self.r2_limbs = int_to_limbs_py(self.R2, self.L)
        self.one_mont = int_to_limbs_py(self.R % modulus, self.L)
        self.zero = np.zeros(self.L, dtype=np.uint32)
        # one-hot column-routing matrices for the schoolbook product:
        # flat index (i*L + j) -> column i+j (lo part) / i+j+1 (hi part)
        L = self.L
        m_lo = np.zeros((L * L, 2 * L + 1), dtype=np.uint32)
        m_hi = np.zeros((L * L, 2 * L + 1), dtype=np.uint32)
        for i in range(L):
            for j in range(L):
                m_lo[i * L + j, i + j] = 1
                m_hi[i * L + j, i + j + 1] = 1
        self.m_lo = m_lo
        self.m_hi = m_hi

    # ---- host conversions (tests / IO) ----
    def to_limbs(self, values) -> np.ndarray:
        if isinstance(values, int):
            return int_to_limbs_py(values % self.p, self.L)
        return np.stack([int_to_limbs_py(v % self.p, self.L) for v in values])

    def from_limbs(self, arr):
        arr = np.asarray(arr)
        if arr.ndim == 1:
            return limbs_to_int_py(arr)
        flat = arr.reshape(-1, arr.shape[-1])
        out = [limbs_to_int_py(row) for row in flat]
        if arr.ndim == 2:
            return out
        return np.array(out, dtype=object).reshape(arr.shape[:-1]).tolist()


FQ = FpSpec(P.Q, "fq")
FR = FpSpec(P.R, "fr")
FS = FpSpec(P.S, "fs")


# ---------------------------------------------------------------------------
# carry / compare helpers (lax.scan over the limb axis — compact graphs)
# ---------------------------------------------------------------------------

def resolve_carries(cols, L_out: int):
    """Fold lazy uint32 columns [..., >=L_out] (< 2^31) into 16-bit limbs
    [..., L_out]; carries beyond the top limb are dropped (callers ensure
    the value fits)."""
    x = jnp.moveaxis(cols, -1, 0)

    def body(carry, xi):
        t = xi + carry
        return t >> BASE_BITS, t & MASK

    _, outs = lax.scan(body, jnp.zeros_like(x[0]), x[:L_out])
    return jnp.moveaxis(outs, 0, -1)


def _sub_limbs(a, b):
    """16-bit-limb subtraction with borrow chain -> (diff, borrow_out)."""
    xa = jnp.moveaxis(a, -1, 0)
    xb = jnp.moveaxis(b, -1, 0)

    def body(borrow, ab):
        ai, bi = ab
        t = ai + (1 << BASE_BITS) - bi - borrow
        return 1 - (t >> BASE_BITS), t & MASK

    borrow, outs = lax.scan(body, jnp.zeros_like(xa[0]), (xa, xb))
    return jnp.moveaxis(outs, 0, -1), borrow


def _cond_sub_p(x, spec: FpSpec):
    p = jnp.asarray(spec.p_limbs)
    diff, borrow = _sub_limbs(x, jnp.broadcast_to(p, x.shape))
    keep = (borrow != 0)[..., None]
    return jnp.where(keep, x, diff)


# ---------------------------------------------------------------------------
# modular add / sub / neg
# ---------------------------------------------------------------------------

def _add(a, b, spec: FpSpec):
    s = resolve_carries(a + b, spec.L)
    return _cond_sub_p(s, spec)


def _sub(a, b, spec: FpSpec):
    diff, borrow = _sub_limbs(a, b)
    p = jnp.asarray(spec.p_limbs)
    fixed = resolve_carries(diff + p, spec.L)
    return jnp.where((borrow != 0)[..., None], fixed, diff)


def _neg(a, spec: FpSpec):
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    p = jnp.broadcast_to(jnp.asarray(spec.p_limbs), a.shape)
    diff, _ = _sub_limbs(p, a)
    return jnp.where(is_zero, jnp.zeros_like(a), diff)


# ---------------------------------------------------------------------------
# Montgomery multiplication (the hot kernel)
# ---------------------------------------------------------------------------

def _product_columns(a, b, spec: FpSpec):
    """Schoolbook product as lazy columns [..., 2L+1]; each column < 2^22.
    Column routing is a one-hot matmul (MXU/VPU-friendly, tiny graph)."""
    L = spec.L
    prod = a[..., :, None] * b[..., None, :]              # [..., L, L]
    lo = (prod & MASK).reshape(prod.shape[:-2] + (L * L,))
    hi = (prod >> BASE_BITS).reshape(prod.shape[:-2] + (L * L,))
    m_lo = jnp.asarray(spec.m_lo)
    m_hi = jnp.asarray(spec.m_hi)
    dn = (((lo.ndim - 1,), (0,)), ((), ()))
    cols = lax.dot_general(lo, m_lo, dn, preferred_element_type=jnp.uint32)
    cols = cols + lax.dot_general(hi, m_hi, dn, preferred_element_type=jnp.uint32)
    return cols


def _mont_mul(a, b, spec: FpSpec):
    """REDC(a*b): inputs/outputs in Montgomery form, [..., L] limbs."""
    L = spec.L
    a, b = jnp.broadcast_arrays(a, b)
    p = jnp.asarray(spec.p_limbs)
    n0 = jnp.uint32(spec.n0)
    cols = _product_columns(a, b, spec)

    def body(i, cols):
        ci = lax.dynamic_slice_in_dim(cols, i, 1, axis=-1)[..., 0]
        m = (ci * n0) & MASK
        mp = m[..., None] * p                                  # [..., L]
        addvec = jnp.concatenate(
            [mp & MASK, jnp.zeros(mp.shape[:-1] + (2,), jnp.uint32)], axis=-1
        )
        addvec = addvec.at[..., 1 : L + 1].add(mp >> BASE_BITS)
        sl = lax.dynamic_slice_in_dim(cols, i, L + 2, axis=-1)
        new = sl + addvec
        new = new.at[..., 1].add(new[..., 0] >> BASE_BITS)     # carry out of col i
        return lax.dynamic_update_slice_in_dim(cols, new, i, axis=-1)

    cols = lax.fori_loop(0, L, body, cols)
    res = resolve_carries(cols[..., L:], L)
    return _cond_sub_p(res, spec)


def _mont_sq(a, spec: FpSpec):
    return _mont_mul(a, a, spec)


def _to_mont(a, spec: FpSpec):
    r2 = jnp.broadcast_to(jnp.asarray(spec.r2_limbs), a.shape)
    return _mont_mul(a, r2, spec)


def _from_mont(a, spec: FpSpec):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return _mont_mul(a, one, spec)


def _pow_const(a, e: int, spec: FpSpec):
    """a^e for a static exponent; a in Montgomery form (scan over bits)."""
    if e == 0:
        return jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape).astype(jnp.uint32)
    bits = np.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=np.uint32)

    def body(carry, bit):
        acc, base = carry
        new_acc = jnp.where(bit != 0, _mont_mul(acc, base, spec), acc)
        return (new_acc, _mont_sq(base, spec)), None

    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape).astype(jnp.uint32)
    (acc, _), _ = lax.scan(body, (one, a), jnp.asarray(bits))
    return acc


def _inv(a, spec: FpSpec):
    """Batched inversion via Fermat: a^(p-2). Zero maps to zero."""
    return _pow_const(a, spec.p - 2, spec)


# ---------------------------------------------------------------------------
# public jitted API (spec is static; singleton FpSpec hashes by identity)
# ---------------------------------------------------------------------------

add = jax.jit(_add, static_argnames="spec")
sub = jax.jit(_sub, static_argnames="spec")
neg = jax.jit(_neg, static_argnames="spec")
mont_mul = jax.jit(_mont_mul, static_argnames="spec")
mont_sq = jax.jit(_mont_sq, static_argnames="spec")
to_mont = jax.jit(_to_mont, static_argnames="spec")
from_mont = jax.jit(_from_mont, static_argnames="spec")
pow_const = jax.jit(_pow_const, static_argnames=("e", "spec"))
inv = jax.jit(_inv, static_argnames="spec")


def batch_is_zero(a):
    return jnp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# convenience: canonical-int round trips through Montgomery ops (tests)
# ---------------------------------------------------------------------------

def mont_from_ints(values, spec: FpSpec):
    return to_mont(jnp.asarray(spec.to_limbs(values)), spec)


def ints_from_mont(arr, spec: FpSpec):
    return spec.from_limbs(np.asarray(from_mont(arr, spec)))


# ---------------------------------------------------------------------------
# Unrolled variants: bigger XLA graphs, but the whole carry/REDC chain is
# elementwise across the batch, so XLA fuses it into ONE pass over memory
# (the fori/scan variants force per-iteration materialization). Use these
# in bandwidth-bound pipelines (NTT stages, Poseidon rounds); keep the
# rolled variants inside scans/loops where graph size dominates.
# ---------------------------------------------------------------------------

def _resolve_carries_unrolled(cols, L_out: int):
    outs = []
    carry = jnp.zeros_like(cols[..., 0])
    for i in range(L_out):
        t = cols[..., i] + carry
        outs.append(t & MASK)
        carry = t >> BASE_BITS
    return jnp.stack(outs, axis=-1)


def _sub_limbs_unrolled(a, b):
    outs = []
    borrow = jnp.zeros_like(a[..., 0])
    for i in range(a.shape[-1]):
        t = a[..., i] + (1 << BASE_BITS) - b[..., i] - borrow
        outs.append(t & MASK)
        borrow = 1 - (t >> BASE_BITS)
    return jnp.stack(outs, axis=-1), borrow


def _cond_sub_p_unrolled(x, spec: FpSpec):
    p = jnp.asarray(spec.p_limbs)
    diff, borrow = _sub_limbs_unrolled(x, jnp.broadcast_to(p, x.shape))
    return jnp.where((borrow != 0)[..., None], x, diff)


def _mont_mul_unrolled(a, b, spec: FpSpec):
    """Fully unrolled schoolbook + lazy REDC (list-of-columns form; no
    dynamic slices, no loops — one fused elementwise chain)."""
    L = spec.L
    a, b = jnp.broadcast_arrays(a, b)
    prod = a[..., :, None] * b[..., None, :]
    lo = prod & MASK
    hi = prod >> BASE_BITS
    cols = [jnp.zeros_like(a[..., 0]) for _ in range(2 * L + 1)]
    for i in range(L):
        for j in range(L):
            cols[i + j] = cols[i + j] + lo[..., i, j]
            cols[i + j + 1] = cols[i + j + 1] + hi[..., i, j]
    n0 = jnp.uint32(spec.n0)
    p = spec.p_limbs
    for i in range(L):
        m = (cols[i] * n0) & MASK
        for j in range(L):
            mp = m * jnp.uint32(int(p[j]))
            cols[i + j] = cols[i + j] + (mp & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (mp >> BASE_BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> BASE_BITS)
    res = _resolve_carries_unrolled(jnp.stack(cols[L:], axis=-1), L)
    return _cond_sub_p_unrolled(res, spec)


def _add_unrolled(a, b, spec: FpSpec):
    s = _resolve_carries_unrolled(a + b, spec.L)
    return _cond_sub_p_unrolled(s, spec)


def _sub_unrolled(a, b, spec: FpSpec):
    diff, borrow = _sub_limbs_unrolled(a, b)
    p = jnp.asarray(spec.p_limbs)
    fixed = _resolve_carries_unrolled(diff + p, spec.L)
    return jnp.where((borrow != 0)[..., None], fixed, diff)


mont_mul_u = jax.jit(_mont_mul_unrolled, static_argnames="spec")
add_u = jax.jit(_add_unrolled, static_argnames="spec")
sub_u = jax.jit(_sub_unrolled, static_argnames="spec")
