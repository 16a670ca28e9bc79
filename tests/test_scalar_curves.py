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


def test_glv_mul_matches_double_and_add():
    """GLV endomorphism split (g1.rs:108 glv_endomorphism/mul_projective)."""
    import random
    from snarkvm_tpu.curves import sw_fast as g1f
    from snarkvm_tpu.params import bls12_377 as P

    rng = random.Random(55)
    G = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
    beta, lam, (a1, b1), (a2, b2) = g1f._glv_constants()
    # phi really is the lambda endomorphism
    assert pow(beta, 3, P.Q) == 1 and beta != 1
    assert pow(lam, 3, P.R) == 1 and lam != 1
    assert g1f.to_affine(g1f.glv_endomorphism(G)) == g1f.to_affine(g1f.mul_int(G, lam))
    # basis rows are short
    assert abs(a1) < 1 << 130 and abs(b1) < 1 << 130
    # decomposition halves are ~128 bits and recompose
    for k in [0, 1, 2, P.R - 1, P.R // 2] + [rng.randrange(P.R) for _ in range(6)]:
        k1, k2 = g1f.glv_decompose(k)
        assert abs(k1) < 1 << 130 and abs(k2) < 1 << 130
        assert g1f.to_affine(g1f.glv_mul(G, k)) == g1f.to_affine(g1f.mul_int(G, k))
    # random points too
    for _ in range(3):
        Pj = g1f.mul_int(G, rng.randrange(P.R))
        k = rng.randrange(P.R)
        assert g1f.to_affine(g1f.glv_mul(Pj, k)) == g1f.to_affine(g1f.mul_int(Pj, k))
