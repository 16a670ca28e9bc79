"""KZG10 / SonicKZG10 commit-open-check round trips."""
import random

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.snark.poly import Poly
from snarkvm_tpu.snark.fs import FiatShamir

rng = random.Random(0x6264)


def rand_poly(deg):
    return Poly([rng.randrange(P.R) for _ in range(deg + 1)])


def test_commit_open_check_single():
    srs = kzg.test_srs(32)
    p = rand_poly(16)
    comm, r = kzg.commit(srs, p)
    point = rng.randrange(P.R)
    value = p.evaluate(point)
    proofs = kzg.batch_open(
        srs, [kzg.LabeledPoly("p", p)], {("p", ("z", point))}, [r], FiatShamir()
    )
    ok = kzg.batch_check(
        srs, [kzg.LabeledCommitment("p", comm)], {("p", ("z", point))},
        {("p", point): value}, proofs, FiatShamir(),
    )
    assert ok
    # wrong value must fail
    bad = kzg.batch_check(
        srs, [kzg.LabeledCommitment("p", comm)], {("p", ("z", point))},
        {("p", point): (value + 1) % P.R}, proofs, FiatShamir(),
    )
    assert not bad


def test_degree_bound_commitment():
    srs = kzg.test_srs(32)
    p = rand_poly(10)
    db = 12
    comm, r = kzg.commit(srs, p, degree_bound=db)
    point = rng.randrange(P.R)
    value = p.evaluate(point)
    proofs = kzg.batch_open(
        srs, [kzg.LabeledPoly("p", p, degree_bound=db)], {("p", ("z", point))}, [r], FiatShamir()
    )
    ok = kzg.batch_check(
        srs, [kzg.LabeledCommitment("p", comm, degree_bound=db)], {("p", ("z", point))},
        {("p", point): value}, proofs, FiatShamir(),
    )
    assert ok


def test_hiding_commitment():
    srs = kzg.test_srs(32)
    p = rand_poly(8)
    comm, r = kzg.commit(srs, p, hiding_bound=1, rng=rng)
    assert r.is_hiding()
    point = rng.randrange(P.R)
    proofs = kzg.batch_open(
        srs, [kzg.LabeledPoly("p", p, hiding_bound=1)], {("p", ("z", point))}, [r], FiatShamir()
    )
    ok = kzg.batch_check(
        srs, [kzg.LabeledCommitment("p", comm)], {("p", ("z", point))},
        {("p", point): p.evaluate(point)}, proofs, FiatShamir(),
    )
    assert ok


def test_multi_poly_multi_point():
    srs = kzg.test_srs(32)
    polys = [rand_poly(d) for d in (5, 9, 14)]
    labels = ["a", "b", "c"]
    comms, rands = [], []
    for lp, lab in zip(polys, labels):
        c, r = kzg.commit(srs, lp)
        comms.append(kzg.LabeledCommitment(lab, c))
        rands.append(r)
    z1, z2 = rng.randrange(P.R), rng.randrange(P.R)
    qs = {("a", ("p1", z1)), ("b", ("p1", z1)), ("c", ("p2", z2))}
    values = {("a", z1): polys[0].evaluate(z1), ("b", z1): polys[1].evaluate(z1),
              ("c", z2): polys[2].evaluate(z2)}
    lps = [kzg.LabeledPoly(lab, p) for lab, p in zip(labels, polys)]
    proofs = kzg.batch_open(srs, lps, qs, rands, FiatShamir())
    assert kzg.batch_check(srs, comms, qs, values, proofs, FiatShamir())


def test_srs_file_roundtrip(tmp_path):
    from snarkvm_tpu.params import srs_io
    srs = kzg.test_srs(32)
    pts = srs.powers_of_beta_g[:8] + [None]
    path = str(tmp_path / "powers.usrs")
    srs_io.write_powers_file(path, pts)
    assert srs_io.read_powers_file(path) == pts
    negmap = {14: srs.neg_power_of_beta_h(14), 30: srs.neg_power_of_beta_h(30)}
    npath = str(tmp_path / "neg.usrs")
    srs_io.write_neg_powers_file(npath, negmap)
    back = srs_io.read_neg_powers_file(npath)
    for k, pt in negmap.items():
        assert back[k] == (pt[0].c, pt[1].c)


def test_commit_lagrange_matches_coefficient_commit():
    """kzg10/mod.rs:159 commit_lagrange: evaluation-form commit equals
    the coefficient-form commit of the interpolated polynomial."""
    import random
    from snarkvm_tpu.polycommit import kzg
    from snarkvm_tpu.snark.poly import Poly, interpolate

    rng = random.Random(321)
    srs = kzg.test_srs(64)
    n = 16
    evals = [rng.randrange(kzg.R) for _ in range(n)]
    com_l, _ = kzg.commit_lagrange(srs, evals)
    poly = interpolate(evals)
    com_c, _ = kzg.commit(srs, poly)
    assert com_l == com_c
    # sparse / zero edge cases
    assert kzg.commit_lagrange(srs, [0] * n)[0] is None or \
        kzg.commit_lagrange(srs, [0] * n)[0] == kzg.commit(srs, Poly([0]))[0]
    one = [0] * n
    one[3] = 7
    com_l1, _ = kzg.commit_lagrange(srs, one)
    com_c1, _ = kzg.commit(srs, interpolate(one))
    assert com_l1 == com_c1
    # hiding variant still verifies as a commitment pair
    com_h, r = kzg.commit_lagrange(srs, evals, hiding_bound=1, rng=rng)
    assert com_h != com_l and r.is_hiding()
