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
