"""Fixed-base windowed multi-scalar multiplication.

Capability parity with the reference's `FixedBase` (snarkVM
`algorithms/src/msm/fixed_base.rs:87`): given ONE base point g and many
scalars, compute [s_i] * g for every scalar via a precomputed window
table — the workhorse of SRS setup (powers of beta) and generator-cache
construction.

TPU-native design (not a translation): the window table is materialized
once as limb-major planes resident on device; each window then costs one
lane-gather (digit-indexed table lookup) and the per-scalar results fold
with log2(windows) complete EC adds over all lanes at once. The host path
(small inputs / no device) walks the same table with Python ints.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..curves import sw_fast as g1f
from ..params import bls12_377 as P


def get_mul_window_size(num_scalars: int) -> int:
    """Window bit-width heuristic (reference fixed_base.rs uses ln(n)-based
    sizing; small inputs get narrow windows so the table stays cheap)."""
    if num_scalars < 32:
        return 3
    return max(3, min(16, int(math.log2(num_scalars)) + 2))


def window_table(base, c: int, num_bits: int = 253):
    """table[w][d] = d * 2^(c*w) * base as Jacobian int tuples.

    base: Jacobian int tuple. Returns a list of `windows` lists, each with
    2^c entries (entry 0 = identity)."""
    windows = (num_bits + c - 1) // c
    table = []
    g_w = base
    for _ in range(windows):
        row = [(0, 1, 0)]
        cur = g_w
        for _ in range((1 << c) - 1):
            row.append(cur)
            cur = g1f.jac_add(cur, g_w)
        table.append(row)
        # advance the window base: g_w <<= c doublings
        for _ in range(c):
            g_w = g1f.jac_double(g_w)
    return table


def _digits(scalar: int, c: int, windows: int):
    return [(scalar >> (c * w)) & ((1 << c) - 1) for w in range(windows)]


def fixed_base_msm(base, scalars, c: int | None = None, num_bits: int = 253):
    """[s * base for s in scalars] on the host via the window table.
    base: Jacobian int tuple; scalars: iterable of ints. Mirrors
    FixedBase::msm (fixed_base.rs:87) capability."""
    scalars = [int(s) % P.R for s in scalars]
    if c is None:
        c = get_mul_window_size(len(scalars))
    windows = (num_bits + c - 1) // c
    table = window_table(base, c, num_bits)
    out = []
    for s in scalars:
        acc = (0, 1, 0)
        for w, d in enumerate(_digits(s, c, windows)):
            if d:
                acc = g1f.jac_add(acc, table[w][d])
        out.append(acc)
    return out


def fixed_base_msm_lm(base, scalars, c: int | None = None,
                      num_bits: int = 253):
    """Device path: the window table rides in as limb-major planes; each
    scalar is a lane. Per window: one digit-gather from the table plane,
    then a log-depth fold across windows. Returns Jacobian int tuples."""
    from . import ec_pallas as ep

    scalars = [int(s) % P.R for s in scalars]
    n = len(scalars)
    if c is None:
        c = get_mul_window_size(n)
    windows = (num_bits + c - 1) // c
    nb = 1 << c

    table = window_table(base, c, num_bits)
    flat = []
    for row in table:
        flat.extend(None if t[2] == 0 else g1f.to_affine(t) for t in row)
    tplane = ep.g1_from_affine_lm_fast(flat)          # [L, windows*nb]

    sl = ep.scalars_to_limbs(scalars)                 # [n, 16]
    from .msm import _extract_digits
    B = max(ep.LANE, ((n + ep.LANE - 1) // ep.LANE) * ep.LANE)

    # accumulate per-scalar across windows with a log-depth pairwise fold:
    # gather window w's contribution into lane i, fold pairs of windows.
    contribs = []
    for w in range(windows):
        digs = _extract_digits(sl, w, c)              # [n]
        idx = jnp.concatenate([w * nb + digs,
                               jnp.zeros(B - n, jnp.int32)])
        contrib = {k: jnp.take(v, idx, axis=1) for k, v in tplane.items()}
        contribs.append(ep._mask_identity(contrib, jnp.arange(B) < n))
    while len(contribs) > 1:
        nxt = [ep.g1_add_lm(contribs[i], contribs[i + 1])
               for i in range(0, len(contribs) - 1, 2)]
        if len(contribs) % 2:
            nxt.append(contribs[-1])
        contribs = nxt
    return ep.g1_lm_to_jac_ints(contribs[0])[:n]
