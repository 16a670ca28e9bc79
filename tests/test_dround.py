"""Device-resident Varuna round computations vs host-int golden
(reference ahp/prover/round_functions/{third,fourth}.rs semantics)."""
import random

import jax

import numpy as np
import jax.numpy as jnp

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.snark import dround
from snarkvm_tpu.snark.dpoly import _ints_to_mont, _mont_to_ints
from snarkvm_tpu.snark import varuna

R = P.R
rng = random.Random(77)


def test_batch_inverse_rows():
    vals = [rng.randrange(1, R) for _ in range(37)]
    out = dround.batch_inverse_rows(_ints_to_mont(vals))
    got = _mont_to_ints(out)
    for v, g in zip(vals, got):
        assert g == pow(v, -1, R)


def test_lagrange_coefficients_device():
    from snarkvm_tpu.snark import poly as poly_mod
    n = 16
    alpha = rng.randrange(R)
    root = poly_mod.domain_elements(n)[1]
    v_alpha = (pow(alpha, n, R) - 1) % R
    got = _mont_to_ints(
        dround.lagrange_coefficients_device(n, alpha, root, v_alpha))
    want = poly_mod.lagrange_coefficients(n, alpha)
    assert got == [w % R for w in want]


def test_segment_sum_mod():
    n, segs = 50, 7
    ids = sorted(rng.randrange(segs) for _ in range(n))
    vals = [rng.randrange(R) for _ in range(n)]
    out = dround.segment_sum_mod(
        _ints_to_mont(vals), jnp.asarray(np.asarray(ids, np.int32)), segs)
    got = _mont_to_ints(out)
    want = [0] * segs
    for i, v in zip(ids, vals):
        want[i] = (want[i] + v) % R
    assert got == want


def test_fourth_round_evals_matches_host():
    nz = 16
    alpha, beta = rng.randrange(R), rng.randrange(R)
    cd, vd = 32, 16
    row = [rng.randrange(1, R) for _ in range(nz)]
    col = [rng.randrange(1, R) for _ in range(nz)]
    rc = [r * c % R for r, c in zip(row, col)]
    val = [rng.randrange(R) for _ in range(nz)]

    class Ev:
        pass

    ev = Ev()
    ev.row, ev.col, ev.row_col, ev.row_col_val = row, col, rc, val
    v_rc = ((pow(alpha, cd, R) - 1) * (pow(beta, vd, R) - 1)) % R
    planes = dround.arith_planes(ev)
    a_e, b_e, f_e = dround.fourth_round_evals(
        planes, alpha, beta, v_rc, cd, vd, nz)
    a_got, b_got, f_got = (_mont_to_ints(x) for x in (a_e, b_e, f_e))

    ab = alpha * beta % R
    rc_size = cd * vd % R
    const = v_rc * pow(cd, -1, R) % R * pow(vd, -1, R) % R
    for i in range(nz):
        assert a_got[i] == v_rc * val[i] % R
        assert b_got[i] == rc_size * ((ab - beta * row[i] - alpha * col[i]
                                       + rc[i]) % R) % R
        d = (alpha - row[i]) * (beta - col[i]) % R
        assert f_got[i] == const * pow(d, -1, R) % R * val[i] % R


def test_matrix_at_alpha_matches_transpose_sum():
    # tiny matrix: 4 constraints x 6 variables
    cd, vd, idd = 4, 8, 2
    matrix = [
        [(3, 0), (5, 2)],
        [(7, 1)],
        [(11, 2), (13, 4), (1, 0)],
        [(2, 5)],
    ]
    alpha = rng.randrange(R)
    l_at = varuna.lagrange_coefficients(cd, alpha)
    planes = dround.transpose_arrays(
        matrix, vd, idd, varuna.reindex_by_subdomain)
    got = _mont_to_ints(
        dround.matrix_at_alpha_evals(planes[0], planes[1], planes[2],
                                     _ints_to_mont(l_at), vd))
    want = [0] * vd
    for ri, rowlist in enumerate(matrix):
        for v, ci in rowlist:
            ci2 = varuna.reindex_by_subdomain(vd, idd, ci)
            want[ci2] = (want[ci2] + v * l_at[ri]) % R
    assert got == want


def test_prove_verify_with_device_rounds(monkeypatch):
    """Full prove/verify with the device round path forced on (the
    SNARKVM_TPU_DEVICE_POLY=always escape hatch exercises dround +
    DPoly on the CPU backend)."""
    monkeypatch.setenv("SNARKVM_TPU_DEVICE_POLY", "always")
    from snarkvm_tpu.polycommit import kzg
    from snarkvm_tpu.snark import r1cs

    class Sq(r1cs.ConstraintSynthesizer):
        def generate_constraints(self, cs):
            c_pub = cs.alloc_input(49)
            a = cs.alloc(7)
            cs.enforce([(1, a)], [(1, a)], [(1, c_pub)])
            prev, prev_val = a, 7
            for _ in range(70):
                nxt_val = prev_val * prev_val % R
                nxt = cs.alloc(nxt_val)
                cs.enforce([(1, prev)], [(1, prev)], [(1, nxt)])
                prev, prev_val = nxt, nxt_val

        def public_inputs(self):
            return [1, 49]

    srs = kzg.test_srs(1024)
    circ = Sq()
    pk, vk = varuna.circuit_setup(srs, circ)
    proof = varuna.prove_batch(srs, [(pk, [circ])], random.Random(3))
    assert varuna.verify_batch(srs, [(vk, [circ.public_inputs()])], proof)


def test_eval_many_matches_single():
    from snarkvm_tpu.snark.dpoly import DPoly
    polys = [DPoly.from_ints([rng.randrange(R) for _ in range(n)])
             for n in (5, 17, 32, 1)]
    z = rng.randrange(R)
    got = dround.eval_many(polys, z)
    for p, g in zip(polys, got):
        assert g == p.evaluate(z)


def test_device_prove_matches_host_prove_exactly():
    """Non-hiding proofs are deterministic: the device-fused round
    pipeline must produce the SAME proof as the host-int path."""
    import os
    from snarkvm_tpu.polycommit import kzg
    from snarkvm_tpu.snark import r1cs

    class Sq(r1cs.ConstraintSynthesizer):
        def generate_constraints(self, cs):
            c_pub = cs.alloc_input(49)
            a = cs.alloc(7)
            cs.enforce([(1, a)], [(1, a)], [(1, c_pub)])
            prev, prev_val = a, 7
            for _ in range(100):
                nxt_val = prev_val * prev_val % R
                nxt = cs.alloc(nxt_val)
                cs.enforce([(1, prev)], [(1, prev)], [(1, nxt)])
                prev, prev_val = nxt, nxt_val

        def public_inputs(self):
            return [1, 49]

    srs = kzg.test_srs(2048)
    circ = Sq()
    pk, vk = varuna.circuit_setup(srs, circ, varuna.VarunaNonHidingMode)

    def prove(mode_env, msm_min=None):
        old = os.environ.get("SNARKVM_TPU_DEVICE_POLY")
        old_min = os.environ.get("SNARKVM_TPU_DEVICE_MSM_MIN")
        os.environ["SNARKVM_TPU_DEVICE_POLY"] = mode_env
        old_msm = os.environ.get("SNARKVM_TPU_DEVICE_MSM")
        if msm_min is not None and jax.default_backend() != "cpu":
            # on-chip runs force the grouped device-MSM commit paths;
            # on the XLA CPU backend the fused MSM pipeline's compile
            # alone exceeds the test budget, so the env stays inert there
            os.environ["SNARKVM_TPU_DEVICE_MSM"] = "always"
            # force the grouped commit_many_dpoly / batched witness-MSM
            # device paths even on tiny domains (ADVICE r1: otherwise no
            # test exercises them end-to-end below the 2^13 threshold)
            os.environ["SNARKVM_TPU_DEVICE_MSM_MIN"] = str(msm_min)
        try:
            return varuna.prove_batch(srs, [(pk, [circ])], random.Random(4),
                                      varuna.VarunaNonHidingMode)
        finally:
            for key, val in (("SNARKVM_TPU_DEVICE_POLY", old),
                             ("SNARKVM_TPU_DEVICE_MSM", old_msm),
                             ("SNARKVM_TPU_DEVICE_MSM_MIN", old_min)):
                if val is None:
                    os.environ.pop(key, None)
                else:
                    os.environ[key] = val

    p_host = prove("off")
    p_dev = prove("always", msm_min=1)
    assert p_host.g_1_eval == p_dev.g_1_eval
    assert p_host.g_a_evals == p_dev.g_a_evals
    assert p_host.g_b_evals == p_dev.g_b_evals
    assert p_host.g_c_evals == p_dev.g_c_evals
    assert p_host.h_0 == p_dev.h_0
    assert p_host.g_1 == p_dev.g_1 and p_host.h_1 == p_dev.h_1
    assert p_host.h_2 == p_dev.h_2
    assert p_host.g_a_commitments == p_dev.g_a_commitments
    assert p_host.third_sums == p_dev.third_sums
    assert p_host.fourth_sums == p_dev.fourth_sums
    assert p_host.pc_proof == p_dev.pc_proof
    assert varuna.verify_batch(srs, [(vk, [circ.public_inputs()])], p_dev,
                               varuna.VarunaNonHidingMode)
