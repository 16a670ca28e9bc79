"""Multi-level plan for the fused Pease NTT (see ntt_fused.py).

Generalizes the two-level Bailey four-step to ANY power-of-two size by
recursing on the row transforms: n = N1 * n2, column NTTs of length
N1 <= MAX_SUB run fully in VMEM, the four-step twiddle (with the
column-transform's bit-reversal absorbed and the level's batch repeat
pre-tiled) multiplies inside the same kernel, and the rows recurse.
The composed output ordering collapses into ONE static gather:

    P(n)[k1 + N1*k2] = bitrev(k1) * n2 + P(n2)[k2],  P(base) = bitrev.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ntt_fused import (L, R_MOD, _bitrev, _mont_limbs_np, _sub_ntt)
from ..fields.limb import FR

MAX_LG_SUB = 7          # in-VMEM sub-transform <= 2^7 (N=256 with 128
                        # lanes overflows the 16M VMEM budget by 164K)


def _split(lg: int):
    """Chunk lg into BALANCED factors <= MAX_LG_SUB (a trailing tiny
    leaf like [7,7,7,1] would burn grid-dispatch overhead on a 2-point
    kernel; [6,6,5,5] keeps every level's kernel meaty)."""
    if lg == 0:
        return [0]
    k = -(-lg // MAX_LG_SUB)
    base, rem = divmod(lg, k)
    return [base + 1] * rem + [base] * (k - rem)


def _out_perm(n: int, chunks) -> np.ndarray:
    if len(chunks) == 1:
        lg = chunks[0]
        return np.asarray([_bitrev(k, lg) for k in range(n)], np.int32)
    lg1 = chunks[0]
    n1 = 1 << lg1
    n2 = n >> lg1
    sub = _out_perm(n2, chunks[1:])
    perm = np.zeros(n, dtype=np.int32)
    for k in range(n):
        k1, k2 = k % n1, k // n1
        perm[k] = _bitrev(k1, lg1) * n2 + sub[k2]
    return perm


class FusedPlanML:
    """Multi-level fused-NTT plan: per-level kernels + ONE final gather."""

    def __init__(self, n: int, w: int, inverse: bool):
        self.n = n
        lg = n.bit_length() - 1
        assert n == 1 << lg
        self.chunks = _split(lg)
        self.perm = _out_perm(n, self.chunks)
        scale = pow(n, -1, R_MOD) if inverse else 1

        # per level: (N1, n2, batch_repeat, w_col, post_tensor|None)
        self.levels = []
        rem, w_l, batch = n, w, 1
        for li, lgc in enumerate(self.chunks):
            N1 = 1 << lgc
            n2 = rem // N1
            w_col = pow(w_l, n2, R_MOD)             # order N1
            post = None
            s_here = scale if li == 0 else 1
            if n2 > 1:
                vals = []
                for j in range(N1):
                    base = pow(w_l, _bitrev(j, lgc), R_MOD)
                    t = 1
                    for _ in range(n2):
                        vals.append(t * s_here % R_MOD)
                        t = t * base % R_MOD
                arr = _mont_limbs_np(vals).reshape(L, N1, n2)
                # pre-tile the level's batch repeat so the kernel block
                # layout is [L, N1, n2*batch]. Stored as NUMPY: building
                # a plan lazily inside a jit trace must not capture
                # tracers (jnp.asarray under an ambient trace returns a
                # Tracer, which would leak through the plan cache).
                arr = np.repeat(arr[:, :, :, None], batch, axis=3)
                post = arr.reshape(L, N1, n2 * batch)
            elif s_here != 1:
                arr = _mont_limbs_np([s_here] * N1).reshape(L, N1, 1)
                post = np.repeat(arr, batch, axis=2)
            self.levels.append((N1, n2, batch, w_col, post))
            rem, w_l, batch = n2, pow(w_l, N1, R_MOD), batch * N1

    def _consts(self):
        """(posts_tuple, perm) as runtime arrays. Passing these as jit
        ARGUMENTS (not closure captures) keeps the 16MB twiddle tensors
        out of the compiled module — closure-captured device arrays get
        embedded as HLO constants, bloating the MLIR shipped to the
        compiler to ~35MB and the compile to many minutes."""
        posts = tuple(jnp.asarray(p) for (_, _, _, _, p) in self.levels
                      if p is not None)
        return posts, jnp.asarray(self.perm)

    def _run(self, x_lm, posts, perm):
        n = self.n
        x = x_lm.reshape(L, n, 1)
        post_ix = []
        k = 0
        for (_, _, _, _, p) in self.levels:
            post_ix.append(k if p is not None else -1)
            if p is not None:
                k += 1

        def rec(x, li):
            # x: [L, m, B] — transform axis 1, batch axis 2
            N1, n2, batch, w_col, _ = self.levels[li]
            post = posts[post_ix[li]] if post_ix[li] >= 0 else None
            m, B = x.shape[1], x.shape[2]
            assert m == N1 * n2 and B == batch
            if n2 == 1:
                return _sub_ntt(x, N1, w_col, post=post)
            X = x.reshape(L, N1, n2 * B)
            X = _sub_ntt(X, N1, w_col, post=post)
            X = X.reshape(L, N1, n2, B)
            X = jnp.swapaxes(X, 1, 2).reshape(L, n2, N1 * B)
            X = rec(X, li + 1)
            X = X.reshape(L, n2, N1, B)
            return jnp.swapaxes(X, 1, 2).reshape(L, N1 * n2, B)

        y = rec(x, 0).reshape(L, n)
        return jnp.take(y, perm, axis=1)

    def apply(self, x_lm):
        """x_lm [16, n] -> NTT, natural order (traceable under jit; the
        plan tensors ride as arguments via the cached jitted runner)."""
        posts, perm = self._consts()
        return self._run(x_lm, posts, perm)

    def jitted(self):
        """One-arg jitted transform with plan tensors as runtime args."""
        posts, perm = self._consts()
        run = jax.jit(self._run)
        return lambda x: run(x, posts, perm)
