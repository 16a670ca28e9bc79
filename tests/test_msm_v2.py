"""MSM v2 (ops/msm_v2.py) vs the host integer Pippenger.

Covers: signed-digit recode roundtrip, small MSMs across sizes (incl.
identity points, zero/one/max scalars), cap-overflow retry (degenerate
all-equal scalars), and the replica/weighted-tree reduction.
Reference parity target: algorithms/src/msm/variable_base/batched.rs:366.
"""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from snarkvm_tpu.ops import ec_pallas as ep
from snarkvm_tpu.ops import msm_v2 as m2
from snarkvm_tpu.curves import sw_fast as g1f
from snarkvm_tpu.params import bls12_377 as P

rng = random.Random(0xB5)


def _points(n):
    base = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
    out, cur = [], base
    for _ in range(n):
        out.append(g1f.to_affine(cur))
        cur = g1f.jac_add(cur, g1f.jac_double(cur))
    return out


def _host_msm(points, scalars):
    acc = None
    for pt, s in zip(points, scalars):
        if pt is None or s == 0:
            continue
        term = g1f.mul_int(g1f.from_affine(pt), s)
        acc = term if acc is None else g1f.jac_add(acc, term)
    return None if acc is None or acc[2] == 0 else g1f.to_affine(acc)


def _aff(j):
    return None if j[2] == 0 else g1f.to_affine(j)


def test_signed_digits_roundtrip():
    c = 8
    W = (253 + c - 1) // c
    scalars = [0, 1, P.R - 1, rng.randrange(P.R), rng.randrange(P.R)]
    sl = ep.scalars_to_limbs(scalars)
    mag, sign = m2.signed_digits(sl, c, W)
    mag = np.asarray(mag)
    sign = np.asarray(sign)
    for i, s in enumerate(scalars):
        v = 0
        for w in range(W):
            d = int(mag[w, i]) * (-1 if sign[w, i] else 1)
            assert abs(d) <= 1 << (c - 1)
            v += d << (c * w)
        assert v == s, f"scalar {i} recode mismatch"


@pytest.mark.parametrize("n,c", [(64, 8), (200, 8), (512, 10)])
def test_msm_v2_matches_host(n, c):
    pts = _points(n)
    scalars = [rng.randrange(P.R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = P.R - 1
    tbl, ident = m2.pack_points_u16(pts)
    sl = ep.scalars_to_limbs(scalars)
    got = _aff(m2.msm_g1_v2(tbl, sl, n, c=c, ident_mask=ident))
    assert got == _host_msm(pts, scalars)


def test_msm_v2_identity_points():
    n = 96
    pts = _points(n)
    pts[3] = None
    pts[70] = None
    scalars = [rng.randrange(P.R) for _ in range(n)]
    tbl, ident = m2.pack_points_u16(pts)
    sl = ep.scalars_to_limbs(scalars)
    got = _aff(m2.msm_g1_v2(tbl, sl, n, c=8, ident_mask=ident))
    assert got == _host_msm(pts, scalars)


def test_msm_v2_cap_overflow_retry():
    # all scalars identical: one bucket per window takes every point,
    # blowing past the Poisson cap — the retry path must still be exact
    n = 128
    pts = _points(n)
    s = rng.randrange(P.R)
    scalars = [s] * n
    tbl, ident = m2.pack_points_u16(pts)
    sl = ep.scalars_to_limbs(scalars)
    got = _aff(m2.msm_g1_v2(tbl, sl, n, c=8, cap=4, ident_mask=ident))
    assert got == _host_msm(pts, scalars)


def test_msm_v2_duplicate_points():
    # same point repeated: buckets must handle equal group elements
    # (the complete formulas cover the doubling case)
    n = 64
    p = _points(1)[0]
    pts = [p] * n
    scalars = [rng.randrange(P.R) for _ in range(n)]
    tbl, ident = m2.pack_points_u16(pts)
    sl = ep.scalars_to_limbs(scalars)
    got = _aff(m2.msm_g1_v2(tbl, sl, n, c=8, ident_mask=ident))
    assert got == _host_msm(pts, scalars)


def test_msm_v2_device_graph_on_cpu():
    """The TPU pipeline graph (_msm_v2_raw: fori accumulation + the
    single-kernel fori reduction) runs on CPU via the rolled 13-bit ops —
    validating the reduction schedule the real chip executes."""
    import jax
    n, c = 96, 8
    pts = _points(n)
    scalars = [rng.randrange(P.R) for _ in range(n)]
    tbl, ident = m2.pack_points_u16(pts)
    sl = ep.scalars_to_limbs(scalars)
    geo = m2.Geometry(n, c)
    raw = jax.jit(m2._msm_v2_raw(geo, int(tbl.shape[0])))
    sX, sY, sZ, dropped = raw(tbl, sl)
    assert int(dropped) == 0
    jacs = m2._lm_proj_to_jac_ints({"X": sX, "Y": sY, "Z": sZ})[:geo.W]
    got = _aff(m2._combine(jacs, c))
    assert got == _host_msm(pts, scalars)
