"""Field-law and published-constant tests for the host scalar field stack.

Mirrors the reference's field/curve law test strategy (curves/src/traits/
tests_field.rs, tests_group.rs) plus the published constants in
curves/documentation/the_aleo_curves/.
"""
import random

import pytest

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.fields.scalar import Fq, Fr, Scalar, Fq2, Fq6, Fq12

rng = random.Random(0xA1E0)


def rand_fq():
    return Fq(rng.randrange(P.Q))


def rand_fq2():
    return Fq2(rng.randrange(P.Q), rng.randrange(P.Q))


def rand_fq6():
    return Fq6(rand_fq2(), rand_fq2(), rand_fq2())


def rand_fq12():
    return Fq12(rand_fq6(), rand_fq6())


@pytest.mark.parametrize("F", [Fq, Fr, Scalar])
def test_field_laws(F):
    for _ in range(20):
        a = F(rng.randrange(F.MODULUS))
        b = F(rng.randrange(F.MODULUS))
        c = F(rng.randrange(F.MODULUS))
        assert a + b == b + a
        assert (a + b) + c == a + (b + c)
        assert a * b == b * a
        assert (a * b) * c == a * (b * c)
        assert a * (b + c) == a * b + a * c
        assert a + F.zero() == a
        assert a * F.one() == a
        assert a - a == F.zero()
        if not a.is_zero():
            assert a * a.inverse() == F.one()
        assert a.square() == a * a
        assert (-a) + a == F.zero()


@pytest.mark.parametrize("F", [Fq, Fr])
def test_sqrt(F):
    for _ in range(10):
        a = F(rng.randrange(F.MODULUS))
        sq = a.square()
        r = sq.sqrt()
        assert r is not None and r.square() == sq
    # non-residue times a square should often be non-residue
    nr = F(F.GENERATOR)
    assert nr.legendre() == -1


def test_two_adic_roots():
    # published Fr root (fr.rs doc comment) and recomputed Fq root
    w = Fr(P.FR_TWO_ADIC_ROOT_OF_UNITY)
    assert w.pow(1 << 47).is_one()
    assert not w.pow(1 << 46).is_one()
    wq = Fq(P.FQ_TWO_ADIC_ROOT_OF_UNITY)
    assert wq.pow(1 << 46).is_one()
    assert not wq.pow(1 << 45).is_one()


def test_doc_root_of_unity_consistency():
    # The curve docs publish a root of unity for each field; check they are
    # actual 2^adicity-order roots (the docs' values are generator^T in
    # Montgomery form in some docs; at minimum ours must satisfy the order eq).
    assert pow(P.FR_TWO_ADIC_ROOT_OF_UNITY, 1 << 47, P.R) == 1


def test_fq2_laws():
    for _ in range(15):
        a, b, c = rand_fq2(), rand_fq2(), rand_fq2()
        assert (a + b) * c == a * c + b * c
        assert (a * b) * c == a * (b * c)
        if not a.is_zero():
            assert a * a.inverse() == Fq2.one()
        assert a.square() == a * a
    # u^2 = -5
    u = Fq2(0, 1)
    assert u.square() == Fq2(P.Q - 5, 0)


def test_fq2_sqrt():
    for _ in range(5):
        a = rand_fq2()
        sq = a.square()
        r = sq.sqrt()
        assert r is not None and r.square() == sq


def test_fq6_laws():
    for _ in range(8):
        a, b, c = rand_fq6(), rand_fq6(), rand_fq6()
        assert (a + b) * c == a * c + b * c
        assert (a * b) * c == a * (b * c)
        if not a.is_zero():
            assert a * a.inverse() == Fq6.one()
    # v^3 = u
    v = Fq6(Fq2.zero(), Fq2.one(), Fq2.zero())
    u_in_fq6 = Fq6(Fq2(0, 1), Fq2.zero(), Fq2.zero())
    assert v * v * v == u_in_fq6


def test_fq12_laws():
    for _ in range(5):
        a, b = rand_fq12(), rand_fq12()
        assert a * b == b * a
        ab = a * b
        assert ab * b.inverse() == a if not b.a.is_zero() or not b.b.is_zero() else True
        assert a.square() == a * a
    # w^2 = v
    w = Fq12(Fq6.zero(), Fq6.one())
    v = Fq12(Fq6(Fq2.zero(), Fq2.one(), Fq2.zero()), Fq6.zero())
    assert w * w == v


def test_frobenius():
    for _ in range(3):
        a = rand_fq12()
        # frobenius(1) == a^q
        assert a.frobenius(1) == a.pow(P.Q)
        assert a.frobenius(2) == a.pow(P.Q**2 % (P.Q**12))  # exact power
    a2 = rand_fq2()
    assert a2.frobenius(1) == a2.pow(P.Q)
    a6 = rand_fq6()
    assert a6.frobenius(1) == (lambda x: Fq6((_pow6(a6, P.Q)).c))(a6)


def _pow6(a: Fq6, e: int) -> Fq6:
    r = Fq6.one()
    base = a
    while e > 0:
        if e & 1:
            r = r * base
        base = base * base
        e >>= 1
    return r
