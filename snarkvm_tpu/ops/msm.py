"""Pippenger multi-scalar multiplication on TPU (BLS12-377 G1 / Edwards).

Replaces the reference's VariableBase MSM (algorithms/src/msm/variable_base/
batched.rs:366 + the CUDA sppark path) with a sort-based, scan-based design
shaped for XLA/TPU:

  window digits (vectorized limb extraction)
    -> argsort points by digit            (XLA sort, no data-dep control flow)
    -> UNsegmented prefix scan of EC adds (lax.associative_scan, log-depth)
    -> bucket sums = boundary differences (group subtraction: S[end_b] - S[end_{b-1}])
    -> window total = sum of suffix sums  (second associative_scan over 2^c buckets)
    -> window combine on host             (tiny: one point per window)

This trades the reference's scatter/prefetch machinery (which TPUs lack)
for two log-depth scans of complete adds — every step is a dense batched
vector op. Multi-chip: points are sharded and per-chip window sums are
psum-reduced (snarkvm_tpu.parallel).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.limb import FQ, FR
from ..params import bls12_377 as P
from . import ec


def _extract_digits(scalar_limbs, window: int, c: int):
    """c-bit digit of each scalar at bit offset window*c. scalar_limbs:
    canonical (non-Mont) 16-bit limbs [n, L]. Returns int32 [n]."""
    bitpos = window * c
    li = bitpos // 16
    ofs = bitpos % 16
    L = scalar_limbs.shape[-1]
    lo = scalar_limbs[..., li]
    nxt1 = scalar_limbs[..., li + 1] if li + 1 < L else jnp.zeros_like(lo)
    nxt2 = scalar_limbs[..., li + 2] if li + 2 < L else jnp.zeros_like(lo)
    # assemble 32+ bits starting at limb li (c <= 16 guaranteed by callers)
    window_bits = (lo >> ofs) | (nxt1 << (16 - ofs)) | jnp.where(
        ofs > 0, nxt2 << (32 - ofs), jnp.zeros_like(nxt2)
    )
    return (window_bits & ((1 << c) - 1)).astype(jnp.int32)


def _scan_add(points, add_fn):
    """Inclusive prefix 'sum' of EC points along axis 0."""
    return jax.lax.associative_scan(add_fn, points, axis=0)


def default_window(n: int) -> int:
    """ln(n)+2 like the reference (batched.rs:390), clamped to [4, 16]."""
    c = int(math.log(max(n, 2)) + 2)
    return max(4, min(c, 16))


def device_window(n: int, num_bits: int = 253) -> int:
    """Window width minimizing the TPU round-scheduled MSM's EC-add count.

    Device cost model (ec_pallas.msm_g1_lm): per window the bucket
    accumulation runs ~max_bucket_count rounds over nb_pad lanes and the
    weighted bucket reduction costs ~2*log2(nb_pad) passes over nb_pad
    lanes. The reference's ln(n)+2 (tuned for CPU batch-affine adds)
    over-sizes windows here: the suffix scan then dominates. Expected max
    bucket count for n balls in 2^c bins ~= mean + 4*sqrt(mean)."""
    # measured on v5e: ~33 M complete adds/s in-graph, ~0.3 ms fixed cost
    # per accumulation round (gather + loop step), in EC-add-equivalents
    fixed_per_round = 10_000.0
    best_c, best_cost = 4, float("inf")
    for c in range(4, 17):
        nb = 1 << c
        nb_pad = max(128, nb)
        w = (num_bits + c - 1) // c
        mean = n / nb
        rounds = mean + 4.0 * math.sqrt(max(mean, 1.0)) + 1.0
        accum = rounds * (fixed_per_round + w * nb_pad)
        suffix = w * nb_pad * 2 * max(c, 7)
        cost = accum + suffix
        if cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def msm_g1(points, scalar_limbs, c: int | None = None, num_bits: int = 253):
    """points: Jacobian G1 dict batch [n]; scalar_limbs: canonical Fr limbs
    [n, 16] uint32. Returns the MSM result as a single Jacobian point dict
    (leading shape ()). Host combines windows (tiny work)."""
    n = scalar_limbs.shape[0]
    if c is None:
        c = default_window(n)
    windows = (num_bits + c - 1) // c

    window_sums = _msm_windows_g1(points, scalar_limbs, c, windows)
    # combine on host: result = sum_w 2^(cw) * W_w  (Horner, ~c*windows doublings)
    total = _index(window_sums, windows - 1)
    for w in range(windows - 2, -1, -1):
        for _ in range(c):
            total = ec.g1_double(total)
        total = ec.g1_add(total, _index(window_sums, w))
    return total


def _index(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def _bucket_windows(points, scalar_limbs, c, windows, add_fn, neg_fn, identity_fn):
    """Shared Pippenger core; returns stacked per-window sums (leading dim
    = windows). The per-window body is traced ONCE and vmapped over the
    window axis — unrolling it (the old shape) made XLA:CPU compiles of
    the 32-window/253-bit configuration take tens of minutes."""
    nb = 1 << c
    digits_all = jnp.stack([_extract_digits(scalar_limbs, w, c)
                            for w in range(windows)])          # [W, n]
    ident1 = jax.tree_util.tree_map(lambda x: x[0], identity_fn((1,)))

    def one_window(digits):
        order = jnp.argsort(digits)
        sorted_digits = digits[order]
        sorted_pts = jax.tree_util.tree_map(lambda x: x[order], points)
        # prefix fold of point adds (lax.scan: one small traced body —
        # the unrolled associative_scan made the graph enormous)
        def pstep(carry, pt):
            nxt = add_fn(carry, pt)
            return nxt, nxt
        _, prefix = jax.lax.scan(pstep, ident1, sorted_pts)    # [n]
        # boundary index for bucket b: last position with digit <= b.
        # S[b] = prefix sum up to that boundary (identity when nothing <= b);
        # bucket_b = S[b] - S[b-1], which is automatically the identity for
        # empty buckets (equal prefixes).
        boundary = jnp.searchsorted(sorted_digits, jnp.arange(nb, dtype=jnp.int32), side="right") - 1
        has_any = boundary >= 0
        safe_boundary = jnp.maximum(boundary, 0)
        ident = identity_fn((nb,))
        S = jax.tree_util.tree_map(lambda x: x[safe_boundary], prefix)   # [nb]
        S = jax.tree_util.tree_map(
            lambda a, b: jnp.where(_bc(has_any, a), a, b), S, ident
        )
        S_prev = jax.tree_util.tree_map(lambda x: jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], 0), S)
        prev_valid = jnp.arange(nb) > 0
        S_prev = jax.tree_util.tree_map(
            lambda a, b: jnp.where(_bc(prev_valid, a), a, b), S_prev, ident
        )
        buckets = add_fn(S, neg_fn(S_prev))                    # [nb]
        # drop bucket 0 (digit 0 contributes nothing)
        buckets = jax.tree_util.tree_map(lambda x: x[1:], buckets)
        # window total = sum_b b * bucket_b = running-suffix fold
        rev = jax.tree_util.tree_map(lambda x: x[::-1], buckets)
        def sstep(carry, b):
            suffix, total = carry
            suffix = add_fn(suffix, b)
            total = add_fn(total, suffix)
            return (suffix, total), 0
        (_, total), _ = jax.lax.scan(sstep, (ident1, ident1), rev)
        return total

    return jax.vmap(one_window)(digits_all)


def _bc(mask, arr):
    """Broadcast bool [k] across arr [k, ..., L]."""
    extra = arr.ndim - 1
    return mask.reshape(mask.shape + (1,) * extra)


def _tree_reduce(batch, add_fn, n, identity_fn):
    """Reduce [n] points to one with log-depth pairwise adds."""
    size = 1
    while size < n:
        size <<= 1
    pad = size - n
    if pad:
        batch = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], 0), batch, identity_fn((pad,))
        )
    while size > 1:
        half = size // 2
        left = jax.tree_util.tree_map(lambda x: x[:half], batch)
        right = jax.tree_util.tree_map(lambda x: x[half:], batch)
        batch = add_fn(left, right)
        size = half
    return jax.tree_util.tree_map(lambda x: x[0], batch)


def _msm_windows_g1(points, scalar_limbs, c, windows):
    return _bucket_windows(points, scalar_limbs, c, windows, ec.g1_add, ec.g1_neg, ec.g1_infinity)


def msm_edwards(points, scalar_limbs, c: int | None = None, num_bits: int = 251):
    """MSM over Edwards-BLS12 (extended coords). scalar_limbs: canonical Fs limbs."""
    n = scalar_limbs.shape[0]
    if c is None:
        c = default_window(n)
    windows = (num_bits + c - 1) // c
    sums = _bucket_windows(points, scalar_limbs, c, windows, ec.ed_add, ec.ed_neg, ec.ed_identity)
    total = _index(sums, windows - 1)
    for w in range(windows - 2, -1, -1):
        for _ in range(c):
            total = ec.ed_add(total, total)
        total = ec.ed_add(total, _index(sums, w))
    return total


# ---------------------------------------------------------------------------
# Python-int golden model
# ---------------------------------------------------------------------------

def msm_g1_py(points, scalars):
    from ..curves import sw

    pts = [(type(sw.G1.F)(x), type(sw.G1.F)(y)) if pt is not None else None
           for pt in points
           for x, y in ([pt] if pt is not None else [(0, 0)])]
    # simpler: build Fq points directly
    from ..fields.scalar import Fq

    fq_pts = [None if pt is None else (Fq(pt[0]), Fq(pt[1])) for pt in points]
    return sw.G1.msm_naive(fq_pts, scalars)
