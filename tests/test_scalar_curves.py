"""Group-law + pairing tests for the host curve stack (ref: curves/src/traits/tests_group.rs)."""
import random

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.curves import edwards, sw, pairing
from snarkvm_tpu.fields.scalar import Fq12

rng = random.Random(0xC04E)


def test_edwards_generator_on_curve():
    assert edwards.is_on_curve(edwards.GENERATOR)
    # generator has prime order
    assert edwards.mul(edwards.GENERATOR, edwards.ORDER) == edwards.IDENTITY_AFFINE


def test_edwards_group_laws():
    g = edwards.GENERATOR
    a = rng.randrange(edwards.ORDER)
    b = rng.randrange(edwards.ORDER)
    ga, gb = edwards.mul(g, a), edwards.mul(g, b)
    assert edwards.add(ga, gb) == edwards.mul(g, (a + b) % edwards.ORDER)
    assert edwards.add(ga, edwards.affine_neg(ga)) == edwards.IDENTITY_AFFINE
    # doubling consistency
    assert edwards.add(ga, ga) == edwards.mul(g, 2 * a % edwards.ORDER)


def test_edwards_x_recover():
    g = edwards.GENERATOR
    y = edwards.x_recover_y(g[0])
    assert y is not None and (y == g[1] or (P.R - y) == g[1])


def test_g1_generator():
    assert sw.G1.is_on_curve(sw.G1.generator)
    assert sw.G1.mul(sw.G1.generator, P.R) is None  # order r


def test_g2_generator():
    assert sw.G2.is_on_curve(sw.G2.generator)
    assert sw.G2.mul(sw.G2.generator, P.R) is None


def test_g1_group_laws():
    g = sw.G1.generator
    a, b = rng.randrange(P.R), rng.randrange(P.R)
    ga, gb = sw.G1.mul(g, a), sw.G1.mul(g, b)
    lhs = sw.G1.to_affine(sw.G1.jac_add(sw.G1.to_jacobian(ga), sw.G1.to_jacobian(gb)))
    assert lhs == sw.G1.mul(g, (a + b) % P.R)


def test_pairing_bilinear():
    g1, g2 = sw.G1.generator, sw.G2.generator
    a = rng.randrange(1, 2**64)
    b = rng.randrange(1, 2**64)
    e_ab = pairing.pairing(sw.G1.mul(g1, a), sw.G2.mul(g2, b))
    e = pairing.pairing(g1, g2)
    assert not e.is_one()
    assert e_ab == e.pow(a * b % P.R)
    # non-degenerate + product check: e(aP,Q) * e(-aP,Q) == 1
    pa = sw.G1.mul(g1, a)
    assert pairing.product_of_pairings([(pa, g2), (sw.G1.affine_neg(pa), g2)]).is_one()
