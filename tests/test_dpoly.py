"""Device-resident polynomials (snark/dpoly.py) vs the int-list Poly —
every op bit-exact."""
import random

import pytest

from snarkvm_tpu.snark.poly import Poly
from snarkvm_tpu.snark.dpoly import DPoly
from snarkvm_tpu.params import bls12_377 as P

R = P.R
rng = random.Random(0xD9)


def _rand(n):
    return [rng.randrange(R) for _ in range(n)]


class TestRoundTrip:
    def test_ints_round_trip(self):
        c = _rand(37)
        assert DPoly.from_ints(c).to_ints() == Poly(c).c

    def test_zero(self):
        z = DPoly.from_ints([0, 0])
        assert z.is_zero() and z.to_ints() == []


class TestArithmetic:
    def test_add_sub(self):
        a, b = _rand(33), _rand(57)
        da, db = DPoly.from_ints(a), DPoly.from_ints(b)
        assert (da + db).to_ints() == (Poly(a) + Poly(b)).c
        assert (da - db).to_ints() == (Poly(a) - Poly(b)).c

    def test_scale(self):
        a = _rand(20)
        k = rng.randrange(R)
        assert DPoly.from_ints(a).scale(k).to_ints() == Poly(a).scale(k).c

    def test_mul(self):
        a, b = _rand(65), _rand(100)
        got = (DPoly.from_ints(a) * DPoly.from_ints(b)).to_ints()
        assert got == (Poly(a) * Poly(b)).c

    def test_evaluate(self):
        a = _rand(77)
        z = rng.randrange(R)
        assert DPoly.from_ints(a).evaluate(z) == Poly(a).evaluate(z)


class TestStructured:
    def test_divide_by_vanishing(self):
        a = _rand(300)
        n = 64
        dq, dr = DPoly.from_ints(a).divide_by_vanishing(n)
        q, r = Poly(a).divide_by_vanishing(n)
        assert dq.to_ints() == q.c
        assert dr.to_ints() == r.c

    def test_divide_by_vanishing_small(self):
        a = _rand(10)
        dq, dr = DPoly.from_ints(a).divide_by_vanishing(64)
        assert dq.is_zero() and dr.to_ints() == Poly(a).c

    def test_mul_by_vanishing(self):
        a = _rand(50)
        assert DPoly.from_ints(a).mul_by_vanishing(16).to_ints() == \
            Poly(a).mul_by_vanishing(16).c

    def test_shift_coeffs(self):
        a = _rand(40)
        assert DPoly.from_ints(a).shift_coeffs(7).to_ints() == \
            Poly(a).shift_coeffs(7).c


class TestDomains:
    def test_fft_round_trip(self):
        a = _rand(50)
        d = DPoly.from_ints(a)
        ev = d.evaluate_over_domain(64)
        back = DPoly.from_evaluations(ev, 50)
        assert back.to_ints() == Poly(a).c

    def test_evaluations_match_poly(self):
        a = _rand(32)
        ev = DPoly.from_ints(a).evaluate_over_domain(32)
        from snarkvm_tpu.snark.dpoly import _mont_to_ints
        got = _mont_to_ints(ev)
        want = Poly(a).evaluate_over_domain(32)
        assert got == [v % R for v in want]

    def test_coset_round_trip(self):
        a = _rand(48)
        ev = DPoly.from_ints(a).coset_evaluate(64)
        back = DPoly.from_coset_evaluations(ev, 48)
        assert back.to_ints() == Poly(a).c


class TestDivideByLinear:
    def test_matches_poly(self):
        a = _rand(100)
        z = rng.randrange(R)
        dq, drem = DPoly.from_ints(a).divide_by_linear(z)
        q, rem = Poly(a).divide_by_linear(z)
        assert drem == rem == Poly(a).evaluate(z)
        assert dq.to_ints() == q.c

    def test_zero_point(self):
        a = _rand(9)
        dq, drem = DPoly.from_ints(a).divide_by_linear(0)
        q, rem = Poly(a).divide_by_linear(0)
        assert drem == rem and dq.to_ints() == q.c

    def test_exact_root(self):
        # p(x) = (x - 5)(x - 7)
        p = Poly([35, -12 % R, 1])
        dq, drem = DPoly.from_poly(p).divide_by_linear(5)
        assert drem == 0
        assert dq.to_ints() == [(-7) % R, 1]
