"""Pallas TPU kernels for limb-plane field arithmetic.

Layout: LIMB-MAJOR [L, B] — limbs on sublanes, batch on lanes (128-wide).
Every slice in the Montgomery pipeline is then STATIC (python-unrolled
over L), so Mosaic compiles a small VMEM-resident kernel: one HBM read
per operand, one write per result — the speed-of-light shape for the
bandwidth-bound NTT butterfly (vs the XLA path which either materializes
loop state per REDC step or blows up graph compile time).

Kernels:
  * mont_mul_block / add_block / sub_block — in-kernel [L, B] helpers
  * butterfly(even, odd, twiddle) -> (top, bot): t = odd*tw; even±t
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limb import FpSpec, MASK, BASE_BITS, FR, FQ


# ---------------------------------------------------------------------------
# In-kernel [L, B] helpers (plain jnp; static sublane slices only)
# ---------------------------------------------------------------------------

def _resolve_carries_lm(cols_list, L_out):
    outs = []
    carry = jnp.zeros_like(cols_list[0])
    for i in range(L_out):
        t = cols_list[i] + carry
        outs.append(t & MASK)
        carry = t >> BASE_BITS
    return outs


def _cond_sub_p_lm(limbs, spec: FpSpec):
    """limbs: list of L [B]-rows. Subtract p if >= p."""
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for i in range(spec.L):
        t = limbs[i] + (1 << BASE_BITS) - jnp.uint32(int(spec.p_limbs[i])) - borrow
        diff.append(t & MASK)
        borrow = 1 - (t >> BASE_BITS)
    keep = borrow != 0
    return [jnp.where(keep, a, d) for a, d in zip(limbs, diff)]


def mont_mul_block(a_rows, b_rows, spec: FpSpec):
    """a_rows/b_rows: lists of L [B] uint32 rows (Montgomery form)."""
    L = spec.L
    cols = [None] * (2 * L + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(L):
        ai = a_rows[i]
        for j in range(L):
            prod = ai * b_rows[j]
            acc(i + j, prod & MASK)
            acc(i + j + 1, prod >> BASE_BITS)
    zero = jnp.zeros_like(a_rows[0])
    cols = [c if c is not None else zero for c in cols]
    n0 = jnp.uint32(spec.n0)
    for i in range(L):
        m = (cols[i] * n0) & MASK
        for j in range(L):
            mp = m * jnp.uint32(int(spec.p_limbs[j]))
            cols[i + j] = cols[i + j] + (mp & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (mp >> BASE_BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> BASE_BITS)
    res = _resolve_carries_lm(cols[L : 2 * L + 1], L)
    return _cond_sub_p_lm(res, spec)


def add_block(a_rows, b_rows, spec: FpSpec):
    carry = jnp.zeros_like(a_rows[0])
    out = []
    for i in range(spec.L):
        t = a_rows[i] + b_rows[i] + carry
        out.append(t & MASK)
        carry = t >> BASE_BITS
    return _cond_sub_p_lm(out, spec)


def sub_block(a_rows, b_rows, spec: FpSpec):
    borrow = jnp.zeros_like(a_rows[0])
    diff = []
    for i in range(spec.L):
        t = a_rows[i] + (1 << BASE_BITS) - b_rows[i] - borrow
        diff.append(t & MASK)
        borrow = 1 - (t >> BASE_BITS)
    # on borrow, add p back
    carry = jnp.zeros_like(a_rows[0])
    fixed = []
    for i in range(spec.L):
        t = diff[i] + jnp.uint32(int(spec.p_limbs[i])) + carry
        fixed.append(t & MASK)
        carry = t >> BASE_BITS
    need_fix = borrow != 0
    return [jnp.where(need_fix, f, d) for f, d in zip(fixed, diff)]


def _rows(ref):
    return [ref[i, :] for i in range(ref.shape[0])]


# ---------------------------------------------------------------------------
# Butterfly kernel
# ---------------------------------------------------------------------------

def _butterfly_kernel(spec, even_ref, odd_ref, tw_ref, top_ref, bot_ref):
    e = _rows(even_ref)
    o = mont_mul_block(_rows(odd_ref), _rows(tw_ref), spec)
    top = add_block(e, o, spec)
    bot = sub_block(e, o, spec)
    for i in range(spec.L):
        top_ref[i, :] = top[i]
        bot_ref[i, :] = bot[i]


@functools.lru_cache(maxsize=None)
def _butterfly_fn(spec: FpSpec, block: int):
    L = spec.L

    def run(even, odd, tw):
        m = even.shape[1]
        grid = (m // block,)
        bs = lambda: pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_butterfly_kernel, spec),
            grid=grid,
            in_specs=[bs(), bs(), bs()],
            out_specs=(bs(), bs()),
            out_shape=(
                jax.ShapeDtypeStruct((L, m), jnp.uint32),
                jax.ShapeDtypeStruct((L, m), jnp.uint32),
            ),
            interpret=(jax.default_backend() == "cpu"),
        )(even, odd, tw)

    return jax.jit(run)


def butterfly(even, odd, tw, spec: FpSpec, block: int = 512):
    """even/odd/tw: [L, m] limb-major uint32 (m % block == 0).
    Returns (even + odd*tw, even - odd*tw)."""
    m = even.shape[1]
    while block > m:
        block //= 2
    block = max(block, 128)
    if m % block != 0:
        block = 128
    assert m % block == 0, f"batch {m} not divisible by block {block}"
    return _butterfly_fn(spec, block)(even, odd, tw)


# ---------------------------------------------------------------------------
# Limb-major NTT driver (transform over lanes, limbs on sublanes)
# ---------------------------------------------------------------------------

def ntt_limb_major(x_lm, domain, inverse: bool = False):
    """x_lm: [L, n] Montgomery limb-major input; returns [L, n] NTT output
    (natural order).

    On TPU with Fr domains of >= 2^10 points this dispatches to the FUSED
    constant-geometry engine (ntt_fused_plan.py: whole sub-transforms in
    VMEM, 417 vs 164 Mbutterfly/s at 2^18); set SNARKVM_TPU_NTT=radix2 to
    force the per-stage butterfly network below."""
    import os
    if (domain.spec.name == "fr" and domain.n >= 1024
            and jax.default_backend() != "cpu"
            and os.environ.get("SNARKVM_TPU_NTT", "fused") == "fused"):
        from .ntt_fused_plan import FusedPlanML
        key = ("_fused_plan_inv" if inverse else "_fused_plan_fwd")
        plan = getattr(domain, key, None)
        if plan is None:
            plan = FusedPlanML(
                domain.n,
                domain.group_gen_inv if inverse else domain.group_gen,
                inverse)
            setattr(domain, key, plan)
        posts, perm = plan._consts()
        return plan._run(x_lm, posts, perm)
    from ..fields import limb as limb_mod

    spec = domain.spec
    n, L = domain.n, spec.L
    tws = domain._inv_twiddles if inverse else domain._fwd_twiddles
    x = jnp.take(x_lm, jnp.asarray(domain._bitrev), axis=1)
    for s in range(1, domain.log_n + 1):
        half = 1 << (s - 1)
        blocks = n >> s
        xr = x.reshape(L, blocks, 2, half)
        even = xr[:, :, 0, :].reshape(L, blocks * half)
        odd = xr[:, :, 1, :].reshape(L, blocks * half)
        tw_plane = jnp.asarray(np.ascontiguousarray(tws[s - 1].T))       # [L, half]
        tw_full = jnp.tile(tw_plane, (1, blocks))
        # interleave ordering: even/odd pairs are (block-major, half-minor);
        # twiddle k applies within each block — tile matches since we
        # flattened as [blocks, half].
        m = blocks * half
        if m >= 128:
            top, bot = butterfly(even, odd, tw_full, spec)
        else:
            e_rm = even.T.reshape(m, L)  # tiny stages: reuse row-major ops
            o_rm = limb_mod.mont_mul(odd.T.reshape(m, L), tw_full.T.reshape(m, L), spec)
            top = limb_mod.add(e_rm, o_rm, spec).T.reshape(L, m)
            bot = limb_mod.sub(e_rm, o_rm, spec).T.reshape(L, m)
        xr = jnp.stack([top.reshape(L, blocks, half), bot.reshape(L, blocks, half)], axis=2)
        x = xr.reshape(L, n)
    if inverse:
        from ..fields import limb as lm
        x = lm.mont_mul(x.T.reshape(n, L), jnp.asarray(domain._size_inv_mont), spec).T.reshape(L, n)
    return x


def to_limb_major(x_rm):
    """[n, L] -> [L, n]."""
    return jnp.transpose(x_rm)


def from_limb_major(x_lm):
    return jnp.transpose(x_lm)
