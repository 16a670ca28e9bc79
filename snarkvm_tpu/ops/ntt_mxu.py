"""MXU-native NTT over Fr: mixed-radix four-step with every digit
product on the systolic array (see ops/mxu.py for the kernel idea).

Replaces the radix-2 butterfly network (22 VPU Montgomery muls per
element at 2^22) with log_64(n) levels of:

  1. length-B column DFT  = ONE int8 matmul  (MXU)
  2. Montgomery reduction = TWO fixed matmuls + carries (MXU + VPU adds)
  3. inter-level twiddles = one VPU mont_mul per element

Bailey/Cooley-Tukey decomposition (n = B * n2, x in natural order):
  X[k1 + B*k2] = sum_{i2} w^(B*i2*k2) [ w^(i2*k1) sum_{i1} x[i1*n2+i2] w^(n2*i1*k1) ]
so each level: reshape [B, n2] -> column DFTs -> twiddle w^(i1*i2) ->
recurse on rows -> transpose. Natural order in, natural order out —
bit-identical to ops/ntt.py's radix-2 engine (tests enforce this).

The inverse transform folds B^-1 into every level's DFT matrix, so the
product of the per-level scales is n^-1 and no separate scaling pass is
needed (cf. EvaluationDomain::ifft, algorithms/src/fft/domain.rs:222).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields import limb
from . import mxu

__all__ = ["NttMxuPlan", "get_plan", "ntt", "intt"]


def _ints_to_mont_limbs(vals, p: int, R: int, L: int = 16) -> np.ndarray:
    """Python ints -> Montgomery-form 16-bit-limb planes [n, L] uint32."""
    buf = b"".join((int(v) * R % p).to_bytes(2 * L, "little") for v in vals)
    return np.frombuffer(buf, dtype="<u2").reshape(len(vals), L).astype(np.uint32)


def _schedule(n: int, max_log_radix: int = 6):
    """Radix list (each a power of two <= 2^max_log_radix, product n)."""
    logs = n.bit_length() - 1
    out = []
    while logs > max_log_radix:
        out.append(1 << max_log_radix)
        logs -= max_log_radix
    if logs > 0 or not out:
        out.append(1 << logs)
    return out


class NttMxuPlan:
    """Per-(domain size, root, direction) constants: DFT digit matrices
    per level + Montgomery-form twiddle tensors."""

    def __init__(self, n: int, w: int, p: int, inverse: bool,
                 width: int = 8, max_log_radix: int = 6):
        self.n = n
        self.mx = mxu.FR8() if width == 8 else mxu.FR4()
        assert self.mx.spec.p == p
        R = self.mx.spec.R
        radices = _schedule(n, max_log_radix)
        self.levels = []
        m, w_l = n, w
        for li, B in enumerate(radices):
            n2 = m // B
            # column-DFT root of order B; inverse folds B^-1 per level
            wB = pow(w_l, n2, p)
            scale = pow(B, -1, p) if inverse else 1
            ent = np.empty((B, B), dtype=object)
            rowv = 1
            for i in range(B):
                v = scale
                for j in range(B):
                    ent[i, j] = v * R % p
                    v = v * rowv % p
                rowv = rowv * wB % p
            A = mxu.dft_matrix(self.mx, ent)
            tw = None
            if n2 > 1:
                # w_l^(i1*i2) for i1 < B, i2 < n2, Montgomery form
                vals = []
                base = 1
                for i1 in range(B):
                    t, row = 1, []
                    for _ in range(n2):
                        row.append(t)
                        t = t * base % p
                    vals.extend(row)
                    base = base * w_l % p
                tw = _ints_to_mont_limbs(vals, p, R).reshape(B, n2, 16)
            self.levels.append((B, jnp.asarray(A, self.mx.dtype),
                                None if tw is None else jnp.asarray(tw)))
            m, w_l = n2, pow(w_l, B, p)

    def apply(self, x):
        """x: [..., n, L] canonical Montgomery limbs -> same, transformed."""
        spec = self.mx.spec

        def rec(x, li):
            B, A, tw = self.levels[li]
            m = x.shape[-2]
            if tw is None:
                assert m == B
                return mxu.dft_apply(self.mx, x, A, B)
            n2 = m // B
            X = x.reshape(*x.shape[:-2], B, n2, x.shape[-1])
            Xc = jnp.swapaxes(X, -3, -2)                 # [.., n2, B, L]
            Xc = mxu.dft_apply(self.mx, Xc, A, B)
            X = jnp.swapaxes(Xc, -3, -2)                 # [.., B, n2, L]
            X = limb._mont_mul(X, jnp.broadcast_to(tw, X.shape), spec)
            X = rec(X, li + 1)                           # rows, batched over B
            X = jnp.swapaxes(X, -3, -2)                  # [.., n2, B, L]
            return X.reshape(*x.shape[:-2], m, x.shape[-1])

        return rec(x, 0)


_PLANS: dict = {}


def get_plan(domain, inverse: bool, width: int = 8) -> NttMxuPlan:
    key = (domain.n, domain.group_gen, inverse, width)
    if key not in _PLANS:
        _PLANS[key] = NttMxuPlan(
            domain.n, domain.group_gen_inv if inverse else domain.group_gen,
            domain.spec.p, inverse, width)
    return _PLANS[key]


def ntt(domain, coeffs, width: int = 8):
    """Forward NTT, natural -> natural order ([..., n, L] Montgomery)."""
    return get_plan(domain, False, width).apply(coeffs)


def intt(domain, evals, width: int = 8):
    """Inverse NTT including the n^-1 scale."""
    return get_plan(domain, True, width).apply(evals)
