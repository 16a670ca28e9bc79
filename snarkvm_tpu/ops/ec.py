"""Batched elliptic-curve ops over limb-plane fields (TPU path).

Two curve families, mirroring the reference's templates (curves/src/templates/):
  * BLS12-377 G1, short Weierstrass y^2 = x^3 + 1 over Fq (24 limbs):
    Jacobian coordinates with a COMPLETE add built from branch-free selects
    (infinity via Z = 0; doubling / inverse cases handled with jnp.where).
  * Edwards-BLS12 twisted Edwards over Fr (16 limbs): extended coordinates
    with the a=-1 UNIFIED add — complete on the odd-order subgroup, no
    branches at all (ideal for TPU vector lanes).

Points are dicts of limb arrays so they flow through jax pytrees
(lax.scan / associative_scan / shard_map).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.limb import FQ, FR
from ..params import bls12_377 as P

# ---------------------------------------------------------------------------
# G1 (short Weierstrass, a=0) — Jacobian {X, Y, Z} over Fq limbs
# ---------------------------------------------------------------------------


def g1_infinity(shape=()):
    L = FQ.L
    zeros = jnp.zeros(shape + (L,), dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont), shape + (L,)).astype(jnp.uint32)
    return {"X": one, "Y": one, "Z": zeros}


def g1_from_affine_ints(points):
    """List of (x, y) int tuples or None -> Jacobian device point batch (Mont form)."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(1)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return {
        "X": limb.mont_from_ints(xs, FQ),
        "Y": limb.mont_from_ints(ys, FQ),
        "Z": limb.mont_from_ints(zs, FQ),
    }


def g1_to_affine_ints(pt):
    """Device Jacobian batch -> list of (x, y) ints / None (host, for tests)."""
    X = limb.ints_from_mont(pt["X"], FQ)
    Y = limb.ints_from_mont(pt["Y"], FQ)
    Z = limb.ints_from_mont(pt["Z"], FQ)
    if isinstance(X, int):
        X, Y, Z = [X], [Y], [Z]
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, P.Q)
            out.append((x * zi * zi % P.Q, y * zi * zi % P.Q * zi % P.Q))
    return out


def _is_zero(a):
    return jnp.all(a == 0, axis=-1)


def _g1_double_impl(p):
    X1, Y1, Z1 = p["X"], p["Y"], p["Z"]
    A = limb.mont_mul(X1, X1, FQ)
    B = limb.mont_mul(Y1, Y1, FQ)
    C = limb.mont_mul(B, B, FQ)
    t = limb.add(X1, B, FQ)
    t = limb.mont_mul(t, t, FQ)
    t = limb.sub(limb.sub(t, A, FQ), C, FQ)
    D = limb.add(t, t, FQ)
    E = limb.add(limb.add(A, A, FQ), A, FQ)
    F = limb.mont_mul(E, E, FQ)
    X3 = limb.sub(F, limb.add(D, D, FQ), FQ)
    C2 = limb.add(C, C, FQ)
    C4 = limb.add(C2, C2, FQ)
    C8 = limb.add(C4, C4, FQ)
    Y3 = limb.sub(limb.mont_mul(E, limb.sub(D, X3, FQ), FQ), C8, FQ)
    YZ = limb.mont_mul(Y1, Z1, FQ)
    Z3 = limb.add(YZ, YZ, FQ)
    return {"X": X3, "Y": Y3, "Z": Z3}


def _g1_add_impl(p, q):
    """Complete Jacobian add (handles inf, doubling, inverses) — branch-free."""
    X1, Y1, Z1 = p["X"], p["Y"], p["Z"]
    X2, Y2, Z2 = q["X"], q["Y"], q["Z"]
    inf1 = _is_zero(Z1)[..., None]
    inf2 = _is_zero(Z2)[..., None]

    Z1Z1 = limb.mont_mul(Z1, Z1, FQ)
    Z2Z2 = limb.mont_mul(Z2, Z2, FQ)
    U1 = limb.mont_mul(X1, Z2Z2, FQ)
    U2 = limb.mont_mul(X2, Z1Z1, FQ)
    S1 = limb.mont_mul(limb.mont_mul(Y1, Z2, FQ), Z2Z2, FQ)
    S2 = limb.mont_mul(limb.mont_mul(Y2, Z1, FQ), Z1Z1, FQ)
    H = limb.sub(U2, U1, FQ)
    r = limb.sub(S2, S1, FQ)

    h_zero = _is_zero(H)
    r_zero = _is_zero(r)
    same = jnp.logical_and(h_zero, r_zero)[..., None]          # P == Q
    opp = jnp.logical_and(h_zero, ~r_zero)[..., None]          # P == -Q

    H2 = limb.add(H, H, FQ)
    I = limb.mont_mul(H2, H2, FQ)
    J = limb.mont_mul(H, I, FQ)
    r2 = limb.add(r, r, FQ)
    V = limb.mont_mul(U1, I, FQ)
    X3 = limb.sub(limb.sub(limb.mont_mul(r2, r2, FQ), J, FQ), limb.add(V, V, FQ), FQ)
    S1J = limb.mont_mul(S1, J, FQ)
    Y3 = limb.sub(
        limb.mont_mul(r2, limb.sub(V, X3, FQ), FQ), limb.add(S1J, S1J, FQ), FQ
    )
    ZZ = limb.add(Z1, Z2, FQ)
    ZZ = limb.mont_mul(ZZ, ZZ, FQ)
    Z3 = limb.mont_mul(limb.sub(limb.sub(ZZ, Z1Z1, FQ), Z2Z2, FQ), H, FQ)

    dbl = _g1_double_impl(p)
    zero = jnp.zeros_like(Z3)

    def sel(add_c, dbl_c, pc, qc):
        out = jnp.where(same, dbl_c, add_c)
        out = jnp.where(opp, jnp.zeros_like(out) if out is Z3 else out, out)
        return out

    X = jnp.where(same, dbl["X"], X3)
    Y = jnp.where(same, dbl["Y"], Y3)
    Z = jnp.where(same, dbl["Z"], Z3)
    Z = jnp.where(opp, zero, Z)
    # infinity operands
    X = jnp.where(inf1, X2, jnp.where(inf2, X1, X))
    Y = jnp.where(inf1, Y2, jnp.where(inf2, Y1, Y))
    Z = jnp.where(inf1, Z2, jnp.where(inf2, Z1, Z))
    return {"X": X, "Y": Y, "Z": Z}


def _g1_neg_impl(p):
    return {"X": p["X"], "Y": limb.neg(p["Y"], FQ), "Z": p["Z"]}


# ---------------------------------------------------------------------------
# Edwards-BLS12 — extended coordinates {X, Y, T, Z} over Fr limbs (unified add)
# ---------------------------------------------------------------------------

# 2*d in Montgomery form (pure-host precompute: x_mont = x*R mod p)
_D2 = limb.int_to_limbs_py(2 * P.EDWARDS_D * FR.R % P.R, FR.L)


def _d2():
    return _D2


def ed_identity(shape=()):
    L = FR.L
    zeros = jnp.zeros(shape + (L,), dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(FR.one_mont), shape + (L,)).astype(jnp.uint32)
    return {"X": zeros, "Y": one, "T": zeros, "Z": one}


def ed_from_affine_ints(points):
    xs = [pt[0] for pt in points]
    ys = [pt[1] for pt in points]
    ts = [pt[0] * pt[1] % P.R for pt in points]
    return {
        "X": limb.mont_from_ints(xs, FR),
        "Y": limb.mont_from_ints(ys, FR),
        "T": limb.mont_from_ints(ts, FR),
        "Z": limb.mont_from_ints([1] * len(points), FR),
    }


def ed_to_affine_ints(pt):
    X = limb.ints_from_mont(pt["X"], FR)
    Y = limb.ints_from_mont(pt["Y"], FR)
    Z = limb.ints_from_mont(pt["Z"], FR)
    if isinstance(X, int):
        X, Y, Z = [X], [Y], [Z]
    out = []
    for x, y, z in zip(X, Y, Z):
        zi = pow(z, -1, P.R)
        out.append((x * zi % P.R, y * zi % P.R))
    return out


def _ed_add_impl(p, q):
    """Unified extended add (add-2008-hwcd-3, a=-1): complete on odd-order points."""
    A = limb.mont_mul(limb.sub(p["Y"], p["X"], FR), limb.sub(q["Y"], q["X"], FR), FR)
    B = limb.mont_mul(limb.add(p["Y"], p["X"], FR), limb.add(q["Y"], q["X"], FR), FR)
    d2 = jnp.asarray(_d2())
    C = limb.mont_mul(limb.mont_mul(p["T"], jnp.broadcast_to(d2, p["T"].shape), FR), q["T"], FR)
    ZZ = limb.mont_mul(p["Z"], q["Z"], FR)
    Dd = limb.add(ZZ, ZZ, FR)
    E = limb.sub(B, A, FR)
    F = limb.sub(Dd, C, FR)
    G = limb.add(Dd, C, FR)
    H = limb.add(B, A, FR)
    return {
        "X": limb.mont_mul(E, F, FR),
        "Y": limb.mont_mul(G, H, FR),
        "T": limb.mont_mul(E, H, FR),
        "Z": limb.mont_mul(F, G, FR),
    }


def _ed_neg_impl(p):
    return {"X": limb.neg(p["X"], FR), "Y": p["Y"], "T": limb.neg(p["T"], FR), "Z": p["Z"]}


g1_double = jax.jit(_g1_double_impl)
g1_add = jax.jit(_g1_add_impl)
g1_neg = jax.jit(_g1_neg_impl)
ed_add = jax.jit(_ed_add_impl)
ed_neg = jax.jit(_ed_neg_impl)
