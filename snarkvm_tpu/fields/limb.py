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
  * Lazy-carry REDC: one interleaved carry per reduction step keeps column
    values bounded; full carry resolution only at the end.

Everything here is pure jnp on static shapes — jit/vmap/shard_map friendly.
The VPU executes the elementwise limb ops; Pallas kernels (ops/) fuse them
to keep the working set in VMEM.

Behavioral parity: fields/src/fp_256.rs mont_reduce (fp_256.rs:69,285) and
utilities/src/biginteger carry chains (mod.rs:102-142), re-derived for
16-bit lanes.
"""
from __future__ import annotations

import numpy as np
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
    """Static per-field constants (become XLA constants when closed over)."""

    def __init__(self, modulus: int, name: str):
        self.p = modulus
        self.name = name
        self.L = (modulus.bit_length() + BASE_BITS - 1) // BASE_BITS
        # round Fr up to 16 limbs (253 bits -> 16) and Fq to 24 (377 -> 24);
        # bit_length//16 already gives that.
        self.R = 1 << (BASE_BITS * self.L)
        self.R2 = self.R * self.R % modulus
        self.n0 = (-pow(modulus, -1, 1 << BASE_BITS)) % (1 << BASE_BITS)
        self.p_limbs = int_to_limbs_py(modulus, self.L)
        self.r2_limbs = int_to_limbs_py(self.R2, self.L)
        self.one_mont = int_to_limbs_py(self.R % modulus, self.L)  # 1 in Mont form
        self.zero = np.zeros(self.L, dtype=np.uint32)

    # ---- host conversions (tests / IO) ----
    def to_limbs(self, values) -> np.ndarray:
        """Canonical ints -> canonical (non-Montgomery) limb array [n, L]."""
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
FS = FpSpec(P.S, "fs")  # Edwards scalar field


# ---------------------------------------------------------------------------
# carry / compare helpers
# ---------------------------------------------------------------------------

def resolve_carries(cols, L_out: int):
    """Fold a lazy uint32 column array [..., >=L_out] (values < 2^31) into
    16-bit limbs [..., L_out]. Any carry out of the top limb is dropped
    (callers guarantee the represented value fits)."""
    outs = []
    carry = jnp.zeros(cols.shape[:-1], dtype=jnp.uint32)
    for i in range(L_out):
        t = cols[..., i] + carry
        outs.append(t & MASK)
        carry = t >> BASE_BITS
    return jnp.stack(outs, axis=-1)


def _sub_limbs(a, b):
    """16-bit-limb subtraction with borrow chain. Returns (diff, borrow_out)."""
    outs = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    L = a.shape[-1]
    for i in range(L):
        # compute in uint32: a - b - borrow + 2^16
        t = a[..., i] + (1 << BASE_BITS) - b[..., i] - borrow
        outs.append(t & MASK)
        borrow = 1 - (t >> BASE_BITS)  # t >= 2^16  <=> no borrow
    return jnp.stack(outs, axis=-1), borrow


def _cond_sub_p(x, spec: FpSpec):
    """x (L limbs, value < 2p) -> x mod p via one conditional subtract."""
    p = jnp.asarray(spec.p_limbs)
    diff, borrow = _sub_limbs(x, jnp.broadcast_to(p, x.shape))
    keep = (borrow != 0)[..., None]  # borrow => x < p => keep x
    return jnp.where(keep, x, diff)


# ---------------------------------------------------------------------------
# modular add / sub / neg  (work on canonical or Montgomery form alike)
# ---------------------------------------------------------------------------

def add(a, b, spec: FpSpec):
    s = a + b  # limbs < 2^17
    s = resolve_carries(s, spec.L)
    return _cond_sub_p(s, spec)


def sub(a, b, spec: FpSpec):
    diff, borrow = _sub_limbs(a, b)
    # if borrow, add p back
    p = jnp.asarray(spec.p_limbs)
    fixed = resolve_carries(diff + p, spec.L)
    return jnp.where((borrow != 0)[..., None], fixed, diff)


def neg(a, spec: FpSpec):
    z = jnp.zeros_like(a)
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    p = jnp.broadcast_to(jnp.asarray(spec.p_limbs), a.shape)
    diff, _ = _sub_limbs(p, a)
    return jnp.where(is_zero, z, diff)


# ---------------------------------------------------------------------------
# Montgomery multiplication (the hot kernel)
# ---------------------------------------------------------------------------

def _product_columns(a, b, L: int):
    """Schoolbook product as lazy columns: returns uint32 [..., 2L]
    where each column < 2L * 2^16 ≈ 2^21.6."""
    prod = a[..., :, None] * b[..., None, :]          # [..., L, L] (mod 2^32 exact)
    lo = prod & MASK
    hi = prod >> BASE_BITS
    cols = jnp.zeros(a.shape[:-1] + (2 * L + 1,), dtype=jnp.uint32)
    for i in range(L):
        cols = cols.at[..., i : i + L].add(lo[..., i, :])
        cols = cols.at[..., i + 1 : i + L + 1].add(hi[..., i, :])
    return cols


def mont_mul(a, b, spec: FpSpec):
    """REDC(a*b): inputs/outputs in Montgomery form, 16-bit limbs [..., L]."""
    L = spec.L
    p = jnp.asarray(spec.p_limbs)            # [L]
    cols = _product_columns(a, b, L)          # [..., 2L+1]
    n0 = jnp.uint32(spec.n0)
    for i in range(L):
        m = (cols[..., i] * n0) & MASK        # [...]
        mp = m[..., None] * p                 # [..., L] each < 2^32
        cols = cols.at[..., i : i + L].add(mp & MASK)
        cols = cols.at[..., i + 1 : i + L + 1].add(mp >> BASE_BITS)
        # resolve the (now complete) column i so its carry reaches column i+1
        cols = cols.at[..., i + 1].add(cols[..., i] >> BASE_BITS)
    res = resolve_carries(cols[..., L : 2 * L + 1], L)
    return _cond_sub_p(res, spec)


def mont_sq(a, spec: FpSpec):
    return mont_mul(a, a, spec)


def to_mont(a, spec: FpSpec):
    """Canonical limbs -> Montgomery form (multiply by R^2)."""
    r2 = jnp.broadcast_to(jnp.asarray(spec.r2_limbs), a.shape)
    return mont_mul(a, r2, spec)


def from_mont(a, spec: FpSpec):
    """Montgomery -> canonical (multiply by 1)."""
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(a, one, spec)


# ---------------------------------------------------------------------------
# exponentiation / inversion (scan over exponent bits — compact XLA graph)
# ---------------------------------------------------------------------------

def pow_const(a, e: int, spec: FpSpec):
    """a^e for a fixed Python-int exponent; a in Montgomery form."""
    if e == 0:
        return jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape).astype(jnp.uint32)
    nbits = e.bit_length()
    bits = np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32)

    def body(carry, bit):
        acc, base = carry
        new_acc = jnp.where(bit != 0, mont_mul(acc, base, spec), acc)
        new_base = mont_sq(base, spec)
        return (new_acc, new_base), None

    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape).astype(jnp.uint32)
    (acc, _), _ = lax.scan(body, (one, a), jnp.asarray(bits))
    return acc


def inv(a, spec: FpSpec):
    """Batched inversion via Fermat: a^(p-2). Zero maps to zero."""
    return pow_const(a, spec.p - 2, spec)


def batch_is_zero(a):
    return jnp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# convenience: canonical-int round trips through Montgomery ops (tests)
# ---------------------------------------------------------------------------

def mont_from_ints(values, spec: FpSpec):
    return to_mont(jnp.asarray(spec.to_limbs(values)), spec)


def ints_from_mont(arr, spec: FpSpec):
    return spec.from_limbs(np.asarray(from_mont(arr, spec)))
