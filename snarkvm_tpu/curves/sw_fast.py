"""Fast host G1 arithmetic on raw int Jacobian tuples (X, Y, Z) mod Q.

Class-free inner loops for the host-side KZG/MSM paths (the reference's
CPU Pippenger, msm/variable_base/standard.rs:79). Device MSM (ops/msm.py)
takes over at large sizes.
"""
from __future__ import annotations

from ..params import bls12_377 as P

Q = P.Q
INF = (1, 1, 0)


def from_affine(pt):
    if pt is None:
        return INF
    x, y = pt
    return (x, y, 1)


def to_affine(j):
    X, Y, Z = j
    if Z == 0:
        return None
    zi = pow(Z, -1, Q)
    z2 = zi * zi % Q
    return (X * z2 % Q, Y * z2 % Q * zi % Q)


def batch_to_affine(jacs):
    """Montgomery's batch-inversion trick: ONE modular inversion for the
    whole batch (vs one per point in to_affine) + 3 mults per point."""
    out = [None] * len(jacs)
    prefix = []
    acc = 1
    for j in jacs:
        if j[2] != 0:
            prefix.append(acc)
            acc = acc * j[2] % Q
        else:
            prefix.append(None)
    inv = pow(acc, -1, Q) if acc != 1 or any(j[2] != 0 for j in jacs) else 1
    for i in range(len(jacs) - 1, -1, -1):
        X, Y, Z = jacs[i]
        if Z == 0:
            continue
        zi = inv * prefix[i] % Q
        inv = inv * Z % Q
        z2 = zi * zi % Q
        out[i] = (X * z2 % Q, Y * z2 % Q * zi % Q)
    return out


def jac_double(j):
    X1, Y1, Z1 = j
    if Z1 == 0:
        return j
    A = X1 * X1 % Q
    B = Y1 * Y1 % Q
    C = B * B % Q
    t = (X1 + B)
    D = 2 * (t * t - A - C) % Q
    E = 3 * A % Q
    F = E * E % Q
    X3 = (F - 2 * D) % Q
    Y3 = (E * (D - X3) - 8 * C) % Q
    Z3 = 2 * Y1 * Z1 % Q
    return (X3, Y3, Z3)


def jac_add(j1, j2):
    X1, Y1, Z1 = j1
    X2, Y2, Z2 = j2
    if Z1 == 0:
        return j2
    if Z2 == 0:
        return j1
    Z1Z1 = Z1 * Z1 % Q
    Z2Z2 = Z2 * Z2 % Q
    U1 = X1 * Z2Z2 % Q
    U2 = X2 * Z1Z1 % Q
    S1 = Y1 * Z2 % Q * Z2Z2 % Q
    S2 = Y2 * Z1 % Q * Z1Z1 % Q
    if U1 == U2:
        if S1 == S2:
            return jac_double(j1)
        return INF
    H = (U2 - U1) % Q
    I = 4 * H * H % Q
    J = H * I % Q
    r = 2 * (S2 - S1) % Q
    V = U1 * I % Q
    X3 = (r * r - J - 2 * V) % Q
    Y3 = (r * (V - X3) - 2 * S1 * J) % Q
    Z3 = ((Z1 + Z2) ** 2 - Z1Z1 - Z2Z2) % Q * H % Q
    return (X3, Y3, Z3)


def neg(j):
    return (j[0], (-j[1]) % Q, j[2])


def mul_int(j, k: int):
    if k < 0:
        return mul_int(neg(j), -k)
    acc = INF
    add = j
    while k > 0:
        if k & 1:
            acc = jac_add(acc, add)
        add = jac_double(add)
        k >>= 1
    return acc


# ---------------------------------------------------------------------------
# GLV endomorphism scalar multiplication (curves/src/bls12_377/g1.rs:108
# glv_endomorphism / mul_projective). BLS12-377 G1 carries the cube-root
# endomorphism phi(x, y) = (beta*x, y) with phi(P) = lambda*P; decomposing
# k = k1 + k2*lambda with |k1|,|k2| ~ sqrt(r) halves the doubling count.
# The constants are DERIVED here (quadratic formula for the cube roots,
# lattice reduction for the basis) rather than transcribed.
# ---------------------------------------------------------------------------

import functools as _ft


def _sqrt_mod(a: int, p: int) -> int:
    """Tonelli-Shanks (works for any odd prime p)."""
    a %= p
    if a == 0:
        return 0
    assert pow(a, (p - 1) // 2, p) == 1, "not a quadratic residue"
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        t2, i = t, 0
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


@_ft.cache
def _glv_constants():
    """(beta in Fq, lambda in Fr, (a1, b1), (a2, b2)) with
    phi(G) == lambda*G and a + b*lambda = 0 mod r for both basis rows."""
    R = P.R
    # primitive cube roots of unity: x = (-1 +- sqrt(-3)) / 2
    inv2q = pow(2, -1, Q)
    inv2r = pow(2, -1, R)
    sq_q = _sqrt_mod(Q - 3, Q)
    sq_r = _sqrt_mod(R - 3, R)
    betas = [(-1 + sq_q) * inv2q % Q, (-1 - sq_q) * inv2q % Q]
    lams = [(-1 + sq_r) * inv2r % R, (-1 - sq_r) * inv2r % R]
    G = from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
    gx, gy = to_affine(G)
    beta = lam = None
    for b in betas:
        phi_g = from_affine((gx * b % Q, gy))
        for l in lams:
            if to_affine(mul_int(G, l)) == to_affine(phi_g):
                beta, lam = b, l
                break
        if beta is not None:
            break
    assert beta is not None, "no (beta, lambda) pairing found"
    # lattice basis via extended Euclid on (r, lambda): rows (r_i, -t_i)
    # satisfy r_i - t_i*lambda = 0 mod r; stop at the first remainder
    # below sqrt(r) and take it with its predecessor (classic GLV).
    rs, ts = [R, lam], [0, 1]
    while rs[-1] * rs[-1] >= R:
        qt = rs[-2] // rs[-1]
        rs.append(rs[-2] - qt * rs[-1])
        ts.append(ts[-2] - qt * ts[-1])
    a1, b1 = rs[-1], -ts[-1]
    a2, b2 = rs[-2], -ts[-2]
    assert (a1 + b1 * lam) % R == 0 and (a2 + b2 * lam) % R == 0
    return beta, lam, (a1, b1), (a2, b2)


def glv_endomorphism(j):
    """phi in Jacobian coordinates: (X, Y, Z) -> (beta*X, Y, Z)."""
    beta, _, _, _ = _glv_constants()
    return (j[0] * beta % Q, j[1], j[2])


def glv_decompose(k: int):
    """k mod r -> (k1, k2) with k = k1 + k2*lambda (mod r), both ~128 bits."""
    R = P.R
    _, lam, (a1, b1), (a2, b2) = _glv_constants()
    k %= R
    # round(b2*k/r), round(-b1*k/r) via the Babai nearest-plane step
    c1 = (b2 * k + R // 2) // R
    c2 = (-b1 * k + R // 2) // R
    k1 = k - c1 * a1 - c2 * a2
    k2 = -c1 * b1 - c2 * b2
    assert (k1 + k2 * lam) % R == k
    return k1, k2


def glv_mul(j, k: int):
    """k*P via the endomorphism split: ~halves the doublings vs mul_int
    (the single-scalar path; Pippenger MSM gains nothing from GLV since
    bucket addition counts are digit-invariant — ROADMAP L2 note)."""
    k1, k2 = glv_decompose(k)
    p1 = j if k1 >= 0 else neg(j)
    p2 = glv_endomorphism(j)
    if k2 < 0:
        p2 = neg(p2)
    k1, k2 = abs(k1), abs(k2)
    acc = INF
    for bit in range(max(k1.bit_length(), k2.bit_length()) - 1, -1, -1):
        acc = jac_double(acc)
        if (k1 >> bit) & 1:
            acc = jac_add(acc, p1)
        if (k2 >> bit) & 1:
            acc = jac_add(acc, p2)
    return acc


def msm(points_affine, scalars, c: int = 8):
    """Host Pippenger over affine int points; returns Jacobian tuple."""
    n = len(points_affine)
    assert n == len(scalars)
    if n == 0:
        return INF
    jac = [from_affine(p) for p in points_affine]
    num_bits = max((s.bit_length() for s in scalars), default=1) or 1
    windows = (num_bits + c - 1) // c
    window_sums = []
    for w in range(windows):
        buckets = [INF] * (1 << c)
        shift = w * c
        mask = (1 << c) - 1
        for pt, s in zip(jac, scalars):
            d = (s >> shift) & mask
            if d:
                buckets[d] = jac_add(buckets[d], pt)
        running = INF
        total = INF
        for b in range(len(buckets) - 1, 0, -1):
            running = jac_add(running, buckets[b])
            total = jac_add(total, running)
        window_sums.append(total)
    acc = window_sums[-1]
    for w in range(windows - 2, -1, -1):
        for _ in range(c):
            acc = jac_double(acc)
        acc = jac_add(acc, window_sums[w])
    return acc
