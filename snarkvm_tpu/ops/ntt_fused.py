"""Fused in-VMEM NTT: the whole sub-transform inside ONE Pallas kernel.

The production radix-2 path (pallas_field.ntt_limb_major) launches one
butterfly kernel per stage, paying an HBM round-trip per stage (18
passes at 2^18). Here a length-N (N <= 512) transform runs entirely in
VMEM using the PEASE CONSTANT-GEOMETRY form — every stage has the same
shape (split halves, butterfly, interleave), so the kernel is one
fori_loop over stages with a single traced butterfly (~7k-eqn jaxpr,
compiles like the EC kernel) and the only HBM traffic is one read and
one write per element.

Stage (derived against the O(n^2) DFT, natural input -> BIT-REVERSED
output):
    a, b   = x[:N/2], x[N/2:]
    out[2k]   = a[k] + w^e(t,k) * b[k]
    out[2k+1] = a[k] - w^e(t,k) * b[k]
    e(t, k) = bitrev(k mod 2^t, t) * N / 2^(t+1)

Transforms longer than 512 go through the Bailey four-step (n = n1*n2,
column NTTs -> w^(i1*i2) twiddles -> row NTTs -> transpose), with the
sub-transform bit-reversals ABSORBED into the precomputed four-step
twiddle tables and one final static lane gather (cf. the CUDA NTT the
reference dispatches to, algorithms/cuda/src/lib.rs:42-69)."""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limb import FR, MASK, BASE_BITS
from ..params import bls12_377 as P
from . import pallas_field as pf

L = FR.L          # 16 limbs of 16 bits
R_MOD = P.R
MONT_R = FR.R


def _bitrev(i: int, bits: int) -> int:
    r = 0
    for b in range(bits):
        r |= ((i >> b) & 1) << (bits - 1 - b)
    return r


def _mont_limbs_np(vals) -> np.ndarray:
    """ints -> Montgomery 16-bit limb planes [16, len] uint32."""
    buf = b"".join((int(v) * MONT_R % R_MOD).to_bytes(2 * L, "little")
                   for v in vals)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(vals), L)
    return np.ascontiguousarray(arr.T).astype(np.uint32)


@functools.cache
def _stage_twiddles(N: int, w: int) -> np.ndarray:
    """[lg, 16, N/2] per-stage Montgomery twiddles for the Pease stages."""
    lg = N.bit_length() - 1
    out = np.zeros((lg, L, N // 2), dtype=np.uint32)
    for t in range(lg):
        exps = [_bitrev(k & ((1 << t) - 1), t) * (N >> (t + 1))
                for k in range(N // 2)]
        out[t] = _mont_limbs_np([pow(w, e, R_MOD) for e in exps])
    return out


def _pease_kernel(N: int, lg: int, with_post: bool):
    """Kernel body: x [16, N, C]; tws [lg, 16, N/2]; post [16, N, C]?"""

    def body(x_ref, tw_ref, *rest):
        if with_post:
            post_ref, o_ref = rest
        else:
            (o_ref,) = rest
        x = x_ref[...]

        def stage(t, x):
            tw = tw_ref[t]          # dynamic ref index on the stage axis
            a = [x[i, : N // 2, :] for i in range(L)]
            b = [x[i, N // 2 :, :] for i in range(L)]
            twr = [jnp.broadcast_to(tw[i][:, None], a[0].shape)
                   for i in range(L)]
            wb = pf.mont_mul_block(twr, b, FR)
            top = pf.add_block(a, wb, FR)
            bot = pf.sub_block(a, wb, FR)
            rows = []
            for i in range(L):
                inter = jnp.stack([top[i], bot[i]], axis=1)  # [N/2, 2, C]
                rows.append(inter.reshape(N, x.shape[2]))
            return jnp.stack(rows, axis=0)

        x = lax.fori_loop(0, lg, stage, x)
        if with_post:
            post = post_ref[...]
            xr = [x[i] for i in range(L)]
            pr = [post[i] for i in range(L)]
            x = jnp.stack(pf.mont_mul_block(xr, pr, FR), axis=0)
        o_ref[...] = x

    return body


@functools.cache
def _pease_call(N: int, C_block: int, with_post: bool):
    lg = N.bit_length() - 1
    kernel = _pease_kernel(N, lg, with_post)

    def run(x, tws, post=None):
        Ctot = x.shape[2]
        grid = (Ctot // C_block,)
        data_bs = pl.BlockSpec((L, N, C_block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
        tw_bs = pl.BlockSpec((lg, L, N // 2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        ins = [data_bs, tw_bs] + ([data_bs] if with_post else [])
        args = [x, tws] + ([post] if with_post else [])
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=ins, out_specs=data_bs,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        )(*args)

    return jax.jit(run, static_argnames=())


def _pease_jnp(x, tws, lg: int, N: int, post=None):
    """Pure-XLA mirror of the kernel (CPU path + correctness oracle).

    Uses the ROLLED limb ops (limb._mont_mul scans) with a Python stage
    loop: the unrolled block ops inside a fori_loop take minutes of XLA
    CPU compile; this form compiles in seconds and is bit-identical."""
    from ..fields import limb as _limb
    C = x.shape[2]
    xt = jnp.moveaxis(x, 0, -1)                    # [N, C, L]

    def stage(t, xt):
        tw = jnp.moveaxis(tws[t], 0, -1)           # [N/2, L]
        a, b = xt[: N // 2], xt[N // 2 :]
        twr = jnp.broadcast_to(tw[:, None, :], b.shape)
        wb = _limb._mont_mul(twr, b, FR)
        top = _limb._add(a, wb, FR)
        bot = _limb._sub(a, wb, FR)
        inter = jnp.stack([top, bot], axis=1)      # [N/2, 2, C, L]
        return inter.reshape(N, C, L)

    for t in range(lg):
        xt = stage(t, xt)
    if post is not None:
        postt = jnp.moveaxis(post, 0, -1)
        xt = _limb._mont_mul(xt, postt, FR)
    return jnp.moveaxis(xt, -1, 0)


def _sub_ntt(x, N: int, w: int, post=None, c_block: int | None = None):
    """x: [16, N, C] -> Pease NTT along axis 1 (output bit-reversed)."""
    lg = N.bit_length() - 1
    tws = jnp.asarray(_stage_twiddles(N, w))
    if jax.default_backend() == "cpu":
        return _pease_jnp(x, tws, lg, N, post)
    Ctot = x.shape[2]
    if c_block is None:
        # target ~16k elements per block: the butterfly's live temporaries
        # (product columns + 6 operand lists) cost ~500B/element of
        # scoped VMEM, and 32k-element blocks overflow the 16M budget
        c_block = max(128, (16384 // max(N, 1)) // 128 * 128)
    blk = min(c_block, Ctot)
    while Ctot % blk:
        blk //= 2
    fn = _pease_call(N, blk, post is not None)
    return fn(x, tws, post) if post is not None else fn(x, tws)


class FusedPlan:
    """Per-(n, root, direction) host constants for the fused NTT."""

    MAX_SUB = 512

    def __init__(self, n: int, w: int, inverse: bool):
        self.n = n
        self.inverse = inverse
        lg = n.bit_length() - 1
        assert n == 1 << lg
        if n <= self.MAX_SUB:
            self.n1, self.n2 = n, 1
        else:
            lg1 = min(lg - 1, 9)
            # keep n2 <= 512 too (two-level only; 2^18 = 512*512)
            while (lg - lg1) > 9:
                lg1 = 9
                break
            self.n1 = 1 << lg1
            self.n2 = n >> lg1
            assert self.n2 <= self.MAX_SUB, "three-level sizes: round-2"
        self.w = w
        self.w1 = pow(w, self.n2, R_MOD)         # order n1
        self.w2 = pow(w, self.n1, R_MOD)         # order n2
        scale = pow(n, -1, R_MOD) if inverse else 1

        if self.n2 == 1:
            lgN = self.n1.bit_length() - 1
            self.perm = np.asarray(
                [_bitrev(k, lgN) for k in range(n)], dtype=np.int32)
            self.post1 = None
            self.scale_limbs = (None if scale == 1
                                else jnp.asarray(_mont_limbs_np([scale])[:, 0]))
            return
        self.scale_limbs = None

        n1, n2 = self.n1, self.n2
        lg1, lg2 = n1.bit_length() - 1, n2.bit_length() - 1
        # four-step twiddles with the column-NTT's bitrev absorbed:
        # row j of the level-A output holds output index bitrev(j), so
        # the (i1, i2) twiddle table is built with i1 = bitrev(j).
        vals = []
        for j in range(n1):
            base = pow(self.w, _bitrev(j, lg1), R_MOD)
            t, row = 1, []
            for _ in range(n2):
                row.append(t * scale % R_MOD)
                t = t * base % R_MOD
            vals.extend(row)
        self.post1 = jnp.asarray(_mont_limbs_np(vals).reshape(L, n1, n2))
        # final natural-order gather: X[br1(j) + n1*br2(m)] = T[j, m]
        perm = np.zeros(n, dtype=np.int32)
        for k in range(n):
            k1, k2 = k % n1, k // n1
            j, m = _bitrev(k1, lg1), _bitrev(k2, lg2)
            perm[k] = j * n2 + m
        self.perm = perm

    def apply(self, x_lm):
        """x_lm: [16, n] limb-major Montgomery -> transformed, natural."""
        n = self.n
        if self.n2 == 1:
            y = _sub_ntt(x_lm[:, :, None] if x_lm.ndim == 2 else x_lm,
                         self.n1, self.w1)
            y = y.reshape(L, n)
            if self.scale_limbs is not None:
                from ..fields import limb as _limb
                s = jnp.broadcast_to(self.scale_limbs[None, :], (n, L))
                y = _limb._mont_mul(y.T, s, FR).T
            return y[:, jnp.asarray(self.perm)]
        n1, n2 = self.n1, self.n2
        X = x_lm.reshape(L, n1, n2)
        X = _sub_ntt(X, n1, self.w1, post=self.post1)   # columns + twiddle
        X = jnp.swapaxes(X, 1, 2)                        # [L, n2, n1]
        X = _sub_ntt(X, n2, self.w2)                     # rows
        X = jnp.swapaxes(X, 1, 2).reshape(L, n)          # [L, n1*n2]
        return X[:, jnp.asarray(self.perm)]


_PLANS: dict = {}


def get_plan(domain, inverse: bool) -> FusedPlan:
    key = (domain.n, domain.group_gen, inverse)
    if key not in _PLANS:
        _PLANS[key] = FusedPlan(
            domain.n,
            domain.group_gen_inv if inverse else domain.group_gen,
            inverse)
    return _PLANS[key]


def ntt_fused(domain, x_lm):
    return get_plan(domain, False).apply(x_lm)


def intt_fused(domain, x_lm):
    return get_plan(domain, True).apply(x_lm)
