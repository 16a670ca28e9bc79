"""Bignum arithmetic on the MXU: limb-plane integer matmuls.

The reference accelerates NTT/MSM/polymul with CUDA (sppark/blst,
algorithms/cuda/src/lib.rs:42-69). On TPU the systolic array (MXU) is
the analogous throughput engine, but it multiplies int8 matrices — so
the TPU-native formulation of "many field multiplications against a
FIXED multiplicand matrix" is:

  * split every 256-bit Montgomery residue into P digit planes of
    W bits (W=8: 32 uint8 planes; W=4: 64 nibble planes that fit
    SIGNED int8, the MXU's native type);
  * a length-B DFT over Fr becomes ONE [M, B*P] x [B*P, B*(2P-1)]
    integer matmul against the block-Toeplitz digit expansion of the
    (Montgomery-form) DFT matrix — the MXU does all digit products,
    int32 accumulators hold the exact column sums;
  * Montgomery reduction of the accumulated product planes is TWO more
    matmuls against fixed digit matrices of p' = -p^-1 mod 2^256 and p
    (the only VPU work left is carry propagation and conditional
    subtracts, which are add/shift/select — no multiplies).

Exactness: with canonical inputs (< p) and B <= 64, the accumulated
product V = sum_j x_j * W_ij < 64 * p^2 < 2^511.2, so the REDC output
t = V/2^256 + (q*p)/2^256 < 2^255.3 < 8p fits 16x16-bit limbs and
canonicalizes with three conditional subtracts (4p, 2p, p).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..fields import limb
from ..fields.limb import BASE_BITS, MASK

__all__ = ["MxuSpec", "dft_matrix", "dft_apply", "FR8", "FR4"]


def _digits_of_int(v: int, width: int, count: int) -> np.ndarray:
    base = 1 << width
    out = np.zeros(count, dtype=np.uint8)
    for i in range(count):
        out[i] = v % base
        v //= base
    assert v == 0
    return out


def _par_sub(a, b):
    """Parallel 16-bit-limb subtraction a - b (int32 limbs, low first):
    per-limb differences in [-65535, 65535], borrows resolved with a
    generate/propagate prefix. Returns (diff_limbs, underflow_bool)."""
    t = a - b
    g = t < 0
    p = t == 0

    def op(x, y):
        return (y[0] | (y[1] & x[0]), y[1] & x[1])

    G, _ = lax.associative_scan(op, (g, p), axis=-1)
    borrow_in = jnp.concatenate(
        [jnp.zeros((*G.shape[:-1], 1), bool), G[..., :-1]], axis=-1)
    diff = (t - borrow_in) & 0xFFFF
    return diff, G[..., -1]


class MxuSpec:
    """Digit-plane constants for one field at one plane width."""

    def __init__(self, spec: limb.FpSpec, width: int):
        assert width in (4, 8)
        assert BASE_BITS % width == 0
        self.spec = spec
        self.width = width
        self.per_limb = BASE_BITS // width
        self.P = spec.L * self.per_limb          # planes per 256-bit value
        self.base = 1 << width
        self.dtype = jnp.uint8 if width == 8 else jnp.int8
        R = spec.R                                # 2^256
        p = spec.p
        p_prime = (-pow(p, -1, R)) % R
        # q = (V mod R) * p' mod R: lower-triangular Toeplitz, out plane s
        # sums digit products with k1 + k2 = s < P.
        P_ = self.P
        ppr = _digits_of_int(p_prime, width, P_)
        tri = np.zeros((P_, P_), dtype=np.uint8)
        for k in range(P_):
            tri[k, k:] = ppr[: P_ - k]
        self.p_prime_tri = tri                    # [P_in, P_out]
        # q * p: full Toeplitz into 2P planes
        pd = _digits_of_int(p, width, P_)
        toep = np.zeros((P_, 2 * P_), dtype=np.uint8)
        for k in range(P_):
            toep[k, k:k + P_] = pd
        self.p_toeplitz = toep
        # canonicalization constants: 4p, 2p, p as 16-bit limb rows
        self.sub_chain = np.stack([
            limb.int_to_limbs_py(4 * p, spec.L + 1),
            limb.int_to_limbs_py(2 * p, spec.L + 1),
            limb.int_to_limbs_py(p, spec.L + 1),
        ])

    # ---- plane conversions (VPU masks/shifts) ----
    def to_digits(self, x):
        """[..., L] uint32 16-bit limbs -> [..., P] digit planes."""
        parts = [(x >> (self.width * i)) & (self.base - 1)
                 for i in range(self.per_limb)]
        d = jnp.stack(parts, axis=-1)             # [..., L, per_limb]
        d = d.reshape(*x.shape[:-1], self.P)
        return d.astype(self.dtype)

    def from_digits_u16(self, d):
        """[..., P] int32 digit values -> [..., L] 16-bit limbs (exact)."""
        d = d.astype(jnp.uint32)
        d = d.reshape(*d.shape[:-1], -1, self.per_limb)
        shifts = jnp.asarray([self.width * i for i in range(self.per_limb)],
                             dtype=jnp.uint32)
        return jnp.sum(d << shifts, axis=-1)

    def normalize(self, planes, n_out: int):
        """int32 product planes [..., S] -> exact base-2^W digits
        [..., n_out] (int32 values < base); carries beyond n_out must be
        zero by the caller's bound (or the caller wants the value mod
        base^n_out, which dropping them also computes exactly).

        Fully parallel (no sequential scan): realign the bytes of each
        int32 plane onto their digit positions (values then <= 4*255 for
        W=8), fold carries twice (values <= base), then resolve the
        remaining 0/1 carries with a log-depth generate/propagate prefix
        — O(log S) fused VPU steps instead of an S-step loop."""
        x = planes.astype(jnp.int32)
        S = x.shape[-1]
        W, base = self.width, self.base
        # byte realignment: digit s gets chunk c of plane s - c*(8//W)...
        # chunks are W-bit slices of the 31-bit plane value.
        n_chunks = (31 + W - 1) // W
        step = 1  # each W-bit chunk advances one digit position
        total = max(n_out, S + n_chunks)
        d = jnp.zeros((*x.shape[:-1], total), jnp.int32)
        for c in range(n_chunks):
            chunk = (x >> (W * c)) & (base - 1)
            d = d.at[..., c:c + S].add(chunk)
        # two carry folds: values drop to <= base
        for _ in range(2):
            lo = d & (base - 1)
            hi = d >> W
            d = lo.at[..., 1:].add(hi[..., :-1])
        # remaining carries are 0/1: generate (d >= base), propagate
        # (d == base-1); exclusive prefix via associative scan.
        g = (d >= base)
        p = (d == base - 1)

        def op(a, b):
            # compose low part a then high part b (scan is low->high)
            return (b[0] | (b[1] & a[0]), b[1] & a[1])

        G, _ = lax.associative_scan(op, (g, p), axis=-1)
        carry = jnp.concatenate(
            [jnp.zeros((*G.shape[:-1], 1), bool), G[..., :-1]], axis=-1)
        d = (d + carry) & (base - 1)
        if total < n_out:
            d = jnp.concatenate(
                [d, jnp.zeros((*d.shape[:-1], n_out - total), jnp.int32)],
                axis=-1)
        return d[..., :n_out]

    # ---- REDC of accumulated product planes ----
    def redc(self, prod_planes):
        """[..., S<=2P-1] int32 planes of V < 2^511.3 -> [..., L] canonical
        Montgomery output (V * 2^-256 mod p)."""
        P_ = self.P
        V = self.normalize(prod_planes, 2 * P_)   # exact 512-bit digits
        v_low = V[..., :P_].astype(self.dtype)
        q = jnp.matmul(v_low, jnp.asarray(self.p_prime_tri, self.dtype),
                       preferred_element_type=jnp.int32)
        q = self.normalize(q, P_).astype(self.dtype)   # q mod 2^256
        qp = jnp.matmul(q, jnp.asarray(self.p_toeplitz, self.dtype),
                        preferred_element_type=jnp.int32)
        w = V + qp                                  # [..., 2P] int32
        w = self.normalize(w, 2 * P_)
        # low P digits are 0 by REDC construction; t = W / 2^256 < 2^255.3
        t = self.from_digits_u16(w[..., P_:])       # [..., L] limbs
        return self._canonicalize(t)

    def _canonicalize(self, t):
        """t < 8p as [..., L(+1)] 16-bit limbs -> canonical < p.

        Three conditional subtracts (4p, 2p, p) with log-depth borrow
        resolution — no sequential borrow chain."""
        L = self.spec.L
        if t.shape[-1] < L + 1:
            pad = jnp.zeros((*t.shape[:-1], L + 1 - t.shape[-1]), t.dtype)
            t = jnp.concatenate([t, pad], axis=-1)
        t = t[..., :L + 1].astype(jnp.int32)
        for row in self.sub_chain:
            c = jnp.asarray(row.astype(np.int32))
            diff, underflow = _par_sub(t, jnp.broadcast_to(c, t.shape))
            t = jnp.where(underflow[..., None], t, diff)
        return t[..., :L].astype(jnp.uint32)


@functools.cache
def _mxu_spec(name: str, width: int) -> MxuSpec:
    field = {"fr": limb.FR, "fq": limb.FQ}[name]
    return MxuSpec(field, width)


def FR8() -> MxuSpec:
    return _mxu_spec("fr", 8)


def FR4() -> MxuSpec:
    return _mxu_spec("fr", 4)


def dft_matrix(mx: MxuSpec, entries: np.ndarray) -> np.ndarray:
    """Block-Toeplitz digit expansion of a BxB matrix of field ints
    (already in Montgomery form, canonical < p).

    A[(j, k), (i, s)] = digit_{s-k}(entries[i, j]) so that
    dot(x_digits[M, B*P], A)[m, i*(2P-1)+s] = plane s of
    sum_j x[m, j] * entries[i, j].
    """
    B = entries.shape[0]
    P_ = mx.P
    S = 2 * P_ - 1
    A = np.zeros((B * P_, B * S), dtype=np.uint8)
    digs = np.zeros((B, B, P_), dtype=np.uint8)
    for i in range(B):
        for j in range(B):
            digs[i, j] = _digits_of_int(int(entries[i, j]), mx.width, P_)
    for j in range(B):
        for k in range(P_):
            # out plane s = k + k2 for digit k2 of entries
            row = A[j * P_ + k]
            for i in range(B):
                row[i * S + k: i * S + k + P_] = digs[i, j]
    return A


def dft_apply(mx: MxuSpec, x, A, B: int):
    """Length-B DFT along axis -2 of x [..., B, L] via one MXU matmul.

    A: [B*P, B*(2P-1)] digit matrix from dft_matrix (uint8/int8).
    Returns [..., B, L] canonical Montgomery limbs.
    """
    P_ = mx.P
    S = 2 * P_ - 1
    d = mx.to_digits(x)                          # [..., B, P]
    d = d.reshape(*d.shape[:-2], B * P_)
    prod = jnp.matmul(d, jnp.asarray(A, mx.dtype),
                      preferred_element_type=jnp.int32)
    prod = prod.reshape(*prod.shape[:-1], B, S)
    return mx.redc(prod)
