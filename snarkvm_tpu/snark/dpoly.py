"""Device-resident dense polynomials over Fr — the HBM-resident backing
for the Varuna prover's hot rounds (the reference keeps these in host RAM
with rayon + CUDA NTT offload; here coefficients live on the TPU as
Montgomery limb planes [n, 16] and every transform/pointwise op is a
jitted device computation; the host only orchestrates and absorbs
Fiat-Shamir values).

Representation: jnp.uint32 [n, L=16], Montgomery form, row-major (the
ops/ntt.py Domain layout). Interop with the int-list Poly is explicit
(from_poly/to_poly) and only used at protocol boundaries.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import bls12_377 as P
from ..fields import limb
from ..fields.limb import FR
from ..ops.ntt import Domain
from .poly import Poly

R = P.R
L = FR.L
_R_MONT = FR.R % R          # Montgomery representation of 1


def _next_pow2(n: int) -> int:
    return 1 << max(0, n - 1).bit_length() if n > 1 else 1


@functools.lru_cache(maxsize=64)
def _domain(n: int) -> Domain:
    return Domain(n)


@functools.lru_cache(maxsize=None)
def _jit_to_mont():
    return jax.jit(lambda a: limb._to_mont(a, FR))


def _ints_to_mont(vals) -> jnp.ndarray:
    """Canonical ints -> Montgomery limb plane [n, L]: bulk bytes pack on
    host (no per-element bigint muls), Montgomery conversion ON DEVICE."""
    buf = b"".join((int(v) % R).to_bytes(32, "little") for v in vals)
    arr = np.frombuffer(buf, dtype=np.uint16).reshape(len(vals), 16)
    return _jit_to_mont()(jnp.asarray(arr.astype(np.uint32)))


def _np_canonical_to_mont(arr) -> jnp.ndarray:
    """Canonical [n, 4] u64 numpy plane -> Montgomery limb plane [n, 16]
    (pure-numpy relimb + the device Montgomery conversion) — the C
    indexer's bridge onto the device pipeline, no python bigints."""
    a16 = np.ascontiguousarray(arr).view(np.uint16).reshape(len(arr), 16)
    return _jit_to_mont()(jnp.asarray(a16.astype(np.uint32)))


def _mont_to_ints(a) -> list:
    arr = np.asarray(a).astype(np.uint16)
    data = arr.tobytes()
    rinv = pow(FR.R, -1, R)
    return [int.from_bytes(data[i : i + 32], "little") * rinv % R
            for i in range(0, len(data), 32)]


@functools.lru_cache(maxsize=None)
def _jit_add():
    return jax.jit(lambda a, b: limb.add(a, b, FR))


@functools.lru_cache(maxsize=None)
def _jit_sub():
    return jax.jit(lambda a, b: limb.sub(a, b, FR))


@functools.lru_cache(maxsize=None)
def _jit_mul():
    return jax.jit(lambda a, b: limb.mont_mul(a, b, FR))


@functools.lru_cache(maxsize=None)
def _jit_scale():
    def f(a, k_mont):
        return limb.mont_mul(a, jnp.broadcast_to(k_mont, a.shape), FR)
    return jax.jit(f)


def _tree_sum(x):
    """Sum rows of [n, L] with log-depth limb adds (n power of two)."""
    n = x.shape[0]
    while n > 1:
        half = n // 2
        x = limb.add(x[:half], x[half:], FR)
        n = half
    return x


@functools.lru_cache(maxsize=None)
def _jit_eval(n_pad: int):
    """Evaluate at z: powers built by log-doubling, then dot + tree sum."""
    def f(a, z_mont):
        # powers[0:n_pad] of z via doubling: [1], [1,z], [1,z,z^2,z^3], ...
        pw = jnp.broadcast_to(jnp.asarray(_one_plane(1)), (1, L))
        k = 1
        while k < n_pad:
            top = limb.mont_mul(pw, jnp.broadcast_to(pw[-1:], pw.shape), FR)
            top = limb.mont_mul(top, jnp.broadcast_to(z_mont, top.shape), FR)
            pw = jnp.concatenate([pw, top], axis=0)
            k *= 2
        prods = limb.mont_mul(a, pw[:n_pad], FR)
        return _tree_sum(prods)
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jit_divlin(m: int):
    """Inclusive scan of the affine recurrence U_k = T_k + z*U_{k-1} over
    the reversed coefficient plane T (padded to m rows)."""
    def f(a, z_mont):
        T = a[::-1]                                   # T_k = c_{m-1-k}
        A = jnp.broadcast_to(z_mont, T.shape)         # multiplier plane

        def combine(x, y):
            a1, b1 = x
            a2, b2 = y
            return (limb.mont_mul(a2, a1, FR),
                    limb.add(limb.mont_mul(a2, b1, FR), b2, FR))

        _, U = jax.lax.associative_scan(combine, (A, T), axis=0)
        # a was padded at the TOP coefficients -> T has leading zeros; the
        # scan of zeros contributes nothing, indices shift by (m - n) and
        # the caller slices what it needs (U here is over all m rows, with
        # U[k] corresponding to reversed index k)
        return U
    return jax.jit(f)


@functools.lru_cache(maxsize=1)
def _one_plane(n: int):
    return np.tile(np.array(
        [( _R_MONT >> (16 * i)) & 0xFFFF for i in range(L)],
        dtype=np.uint32), (n, 1))


class DPoly:
    """Device dense polynomial (ascending coefficients, Montgomery limbs)."""

    __slots__ = ("a", "n", "_ints")

    def __init__(self, a, n: int | None = None):
        self.a = a                        # [cap, L] mont limbs (cap >= n)
        self.n = n if n is not None else a.shape[0]
        self._ints = None

    @property
    def c(self) -> list:
        """Int coefficient list (Poly-compatible view; cached — used at
        protocol boundaries like commits and Fiat-Shamir evals)."""
        if self._ints is None:
            self._ints = self.to_ints()
        return self._ints

    @property
    def mod(self) -> int:
        return R

    # ---- constructors -------------------------------------------------
    @classmethod
    def from_ints(cls, coeffs) -> "DPoly":
        coeffs = list(coeffs)
        while coeffs and coeffs[-1] % R == 0:
            coeffs.pop()
        if not coeffs:
            return cls(jnp.zeros((1, L), jnp.uint32), 0)
        return cls(_ints_to_mont(coeffs), len(coeffs))

    @classmethod
    def from_poly(cls, p: Poly) -> "DPoly":
        return cls.from_ints(p.c)

    @classmethod
    def from_mont_plane(cls, a, n: int | None = None) -> "DPoly":
        return cls(a, n)

    def to_ints(self) -> list:
        if self.n == 0:
            return []
        c = _mont_to_ints(self.a[: self.n])
        while c and c[-1] == 0:
            c.pop()
        return c

    def to_poly(self) -> Poly:
        return Poly(self.to_ints())

    # ---- shape helpers -------------------------------------------------
    def is_zero(self) -> bool:
        """Value check (device reduction + one scalar sync)."""
        if self.n == 0:
            return True
        return bool(np.asarray(jnp.all(self.a[: self.n] == 0)))

    def sum_over_domain(self, n: int) -> int:
        """n * sum of coefficients at indices divisible by n (the Varuna
        sumcheck sum) — strided gather + tree sum on device."""
        if self.n == 0:
            return 0
        m = _next_pow2((self.n + n - 1) // n)
        idx = jnp.arange(m) * n
        rows = jnp.where((idx < self.n)[:, None],
                         jnp.take(self.a, jnp.clip(idx, 0, self.a.shape[0] - 1), axis=0), 0)
        total = _tree_sum(rows)
        return _mont_to_ints(total)[0] * n % R

    @property
    def degree(self) -> int:
        return max(0, self.n - 1)

    def _padded(self, m: int):
        cur = self.a.shape[0]
        a = self.a[:m] if cur >= m else jnp.pad(self.a, ((0, m - cur), (0, 0)))
        if self.n < m:
            mask = (jnp.arange(m) < self.n)[:, None]
            a = jnp.where(mask, a, 0)
        return a

    # ---- arithmetic ------------------------------------------------------
    @staticmethod
    def _coerce(o) -> "DPoly":
        return o if isinstance(o, DPoly) else DPoly.from_ints(o.c)

    def __add__(self, o) -> "DPoly":
        o = self._coerce(o)
        m = max(self.n, o.n, 1)
        return DPoly(_jit_add()(self._padded(m), o._padded(m)), m)

    def __sub__(self, o) -> "DPoly":
        o = self._coerce(o)
        m = max(self.n, o.n, 1)
        return DPoly(_jit_sub()(self._padded(m), o._padded(m)), m)

    def __neg__(self) -> "DPoly":
        if self.n == 0:
            return self
        zero = DPoly(jnp.zeros((self.n, L), jnp.uint32), self.n)
        return zero - self

    def scale(self, k: int) -> "DPoly":
        if self.n == 0 or k % R == 0:
            return DPoly(jnp.zeros((1, L), jnp.uint32), 0)
        k_mont = jnp.asarray(_ints_to_mont([k]))
        return DPoly(_jit_scale()(self._padded(self.n), k_mont), self.n)

    def __mul__(self, o):
        if isinstance(o, int):
            return self.scale(o)
        o = self._coerce(o)
        if self.n == 0 or o.n == 0:
            return DPoly(jnp.zeros((1, L), jnp.uint32), 0)
        out_len = self.n + o.n - 1
        m = _next_pow2(out_len)
        d = _domain(m)
        ea = d.fft(self._padded(m))
        eb = d.fft(o._padded(m))
        prod = _jit_mul()(ea, eb)
        return DPoly(d.ifft(prod), out_len)

    def evaluate(self, z: int) -> int:
        if self.n == 0:
            return 0
        m = _next_pow2(self.n)
        z_mont = jnp.asarray(_ints_to_mont([z]))
        out = _jit_eval(m)(self._padded(m), z_mont)
        return _mont_to_ints(out)[0]

    # ---- domain transforms ----------------------------------------------
    def evaluate_over_domain(self, n: int):
        """Montgomery evals plane [n, L] over the order-n subgroup."""
        d = _domain(n)
        assert self.n <= n, "fold-before-fft not supported on device"
        return d.fft(self._padded(n))

    def coset_evaluate(self, n: int):
        d = _domain(n)
        assert self.n <= n
        return d.coset_fft(self._padded(n))

    @classmethod
    def from_evaluations(cls, evals_plane, n: int | None = None) -> "DPoly":
        d = _domain(evals_plane.shape[0])
        return cls(d.ifft(evals_plane), n or evals_plane.shape[0])

    @classmethod
    def from_coset_evaluations(cls, evals_plane, n: int | None = None) -> "DPoly":
        d = _domain(evals_plane.shape[0])
        return cls(d.coset_ifft(evals_plane), n or evals_plane.shape[0])

    # ---- structured division ----------------------------------------------
    def divide_by_vanishing(self, n: int):
        """Divide by x^n - 1: q[i] = sum_{j>=1} c[i + j*n] (suffix sums of
        stride-n slices, log-depth on device); r = c[:n] + q[:n]."""
        if self.n < n + 1:
            return DPoly(jnp.zeros((1, L), jnp.uint32), 0), DPoly(self.a, self.n)
        m = ((self.n + n - 1) // n) * n
        c = self._padded(m).reshape(m // n, n, L)
        # reverse inclusive suffix-sum over axis 0 (mod-r adds)
        blocks = c
        k = 1
        while k < blocks.shape[0]:
            shifted = jnp.pad(blocks, ((0, k), (0, 0), (0, 0)))[k:]
            blocks = limb.add(blocks, shifted, FR)
            k *= 2
        # blocks[j] = sum_{t>=j} c_t ; q chunk j = blocks[j+1]
        q = blocks[1:].reshape(-1, L)
        q_len = self.n - n
        r = _jit_add()(self._padded(n), q[:n] if q.shape[0] >= n
                       else jnp.pad(q, ((0, n - q.shape[0]), (0, 0))))
        return DPoly(q, q_len), DPoly(r, n)

    def mul_by_vanishing(self, n: int) -> "DPoly":
        out_len = self.n + n
        a = self._padded(self.n)
        hi = jnp.pad(a, ((n, 0), (0, 0)))
        lo = jnp.pad(a, ((0, n), (0, 0)))
        return DPoly(_jit_sub()(hi, lo), out_len)

    def shift_coeffs(self, k: int) -> "DPoly":
        if k >= self.n:
            return DPoly(jnp.zeros((1, L), jnp.uint32), 0)
        return DPoly(self.a[k : self.n], self.n - k)

    def divide_by_linear(self, z: int):
        """(quotient, remainder) of division by (x - z). The synthetic-
        division recurrence w_i = c_{i+1} + z*w_{i+1} is a first-order
        affine recurrence; it runs log-depth on device via an associative
        scan over (multiplier, offset) pairs. remainder = p(z)."""
        if self.n == 0:
            return DPoly(jnp.zeros((1, L), jnp.uint32), 0), 0
        m = _next_pow2(self.n)
        z_mont = jnp.asarray(_ints_to_mont([z if z % R else R]))  # handle z=0
        if z % R == 0:
            # division by x: quotient = c[1:], remainder = c[0]
            rem = _mont_to_ints(self.a[:1])[0]
            return self.shift_coeffs(1), rem
        U = _jit_divlin(m)(self._padded(m), z_mont)
        # T_k = c_{m-1-k} (leading zero pad for k < m-n); U_k = S_{m-1-k}
        # where S_j = sum_{t>=j} c_t z^(t-j). Quotient w_i = S_{i+1} =
        # U_{m-2-i}; remainder = S_0 = U_{m-1} = p(z).
        if self.n > 1:
            w = U[m - self.n : m - 1][::-1]
        else:
            w = jnp.zeros((1, L), jnp.uint32)
        rem = _mont_to_ints(U[m - 1 : m])[0]
        return DPoly(w, max(self.n - 1, 0)), rem
