"""Multi-chip sharding paths on the 8-virtual-device CPU mesh."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.fields import limb
from snarkvm_tpu.ops.ntt import Domain, ntt_py
from snarkvm_tpu.ops import ec, msm
from snarkvm_tpu.curves import sw
from snarkvm_tpu.parallel import mesh as pm

rng = random.Random(0xD157)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_ntt_matches_single():
    m = pm.make_mesh(8)
    n1, n2 = 16, 8
    d = pm.DistributedNTT(n1, n2, m)
    coeffs = [rng.randrange(P.R) for _ in range(n1 * n2)]
    dev = limb.mont_from_ints(coeffs, limb.FR)
    got = limb.ints_from_mont(d.fft(dev), limb.FR)
    want = ntt_py(coeffs, Domain(n1 * n2))
    assert got == want


def test_batch_parallel_ntt():
    m = pm.make_mesh(8)
    n = 16
    d = Domain(n)
    fn = pm.batch_parallel_ntt(m, d)
    polys = [[rng.randrange(P.R) for _ in range(n)] for _ in range(8)]
    batch = jnp.stack([limb.mont_from_ints(p, limb.FR) for p in polys])
    out = fn(batch)
    for i, p in enumerate(polys):
        assert limb.ints_from_mont(out[i], limb.FR) == ntt_py(p, d)


def test_sharded_msm_matches_scalar():
    m = pm.make_mesh(8)
    n, c, bits = 16, 4, 12
    pts = [sw.G1.mul(sw.G1.generator, rng.randrange(1, P.R)) for _ in range(n)]
    scalars = [rng.randrange(1 << bits) for _ in range(n)]
    pts_dev = ec.g1_from_affine_ints([(p[0].v, p[1].v) for p in pts])
    sc_dev = jnp.asarray(limb.FR.to_limbs(scalars))
    fn = pm.sharded_msm_g1(m, c=c, num_bits=bits)
    got = ec.g1_to_affine_ints(fn(pts_dev, sc_dev))[0]
    want = sw.G1.msm_naive(pts, scalars)
    assert got == (want[0].v, want[1].v)


def test_prove_batch_mesh_instance_dp_proof_equality():
    """Instance-DP through prove_batch (VERDICT r2 #2 / SURVEY §2.8 P4):
    the first-round witness pipeline sharded over the 8-device mesh
    yields a BIT-IDENTICAL proof to the single-device path."""
    import random as _rand
    from snarkvm_tpu.snark import varuna, r1cs
    from snarkvm_tpu.polycommit import kzg

    R = P.R
    n = 56

    class Chain:
        def __init__(self, x0):
            self.x0 = x0

        def generate_constraints(self, cs):
            x = cs.alloc_input(3)
            cur_v, cur = cs.alloc(self.x0), self.x0
            for _ in range(n):
                nv = cur * cur % R
                nxt = cs.alloc(nv)
                cs.enforce([(1, cur_v)], [(1, cur_v)], [(1, nxt)])
                cur_v, cur = nxt, nv
            cs.enforce([(0, x)], [(1, cur_v)], [(0, cs.one)])

    srs = kzg.test_srs(1 << 9)
    pk, vk = varuna.circuit_setup(srs, Chain(5), varuna.VarunaNonHidingMode)
    insts = []
    for x0 in (5, 7, 9, 11, 13, 2, 3, 8):   # 8 instances over 8 devices
        cs = r1cs.ConstraintSystem()
        Chain(x0).generate_constraints(cs)
        cs.pad_input_to_power_of_two()
        insts.append(cs)
    want = varuna.prove_batch(srs, [(pk, insts)], _rand.Random(1),
                              varuna.VarunaNonHidingMode)
    m = pm.make_mesh(8)
    got = varuna.prove_batch(srs, [(pk, insts)], _rand.Random(1),
                             varuna.VarunaNonHidingMode, mesh=m)
    assert got == want   # bit-identical proof


def test_distributed_intt_matches_single():
    m = pm.make_mesh(8)
    n1, n2 = 16, 8
    d = pm.DistributedNTT(n1, n2, m)
    vals = [rng.randrange(P.R) for _ in range(n1 * n2)]
    dev = limb.mont_from_ints(vals, limb.FR)
    # round-trip: ifft(fft(x)) == x
    got = limb.ints_from_mont(d.ifft(d.fft(dev)), limb.FR)
    assert got == vals
    # and against the single-device inverse
    dom = Domain(n1 * n2)
    got2 = limb.ints_from_mont(d.ifft(dev), limb.FR)
    want2 = limb.ints_from_mont(dom.ifft(dev), limb.FR)
    assert got2 == want2


def test_sharded_rowcheck_matches_dround():
    """The domain-sharded round-2 rowcheck (VERDICT r4 #7): bit-exact vs
    the single-device dround.rowcheck_contrib."""
    from snarkvm_tpu.snark import dround

    m = pm.make_mesh(8)
    cd = 256
    vals = lambda: [rng.randrange(P.R) for _ in range(cd)]
    za, zb, zc = vals(), vals(), vals()
    # satisfy nothing in particular — the rowcheck pipeline is linear in
    # its inputs after the pointwise product; bit-exactness is the claim
    za_e = limb.mont_from_ints(za, limb.FR)
    zb_e = limb.mont_from_ints(zb, limb.FR)
    zc_e = limb.mont_from_ints(zc, limb.FR)
    ic, ccomb, max_cd = 3, 7, 2 * cd
    want = dround.rowcheck_contrib(za_e, zb_e, zc_e, ic, ccomb, max_cd, cd)

    mult = ic * ccomb % P.R * cd % P.R * pow(max_cd, -1, P.R) % P.R
    from snarkvm_tpu.snark.dround import _ints_to_mont
    src = pm.ShardedRowcheck(m, cd)
    got = src(za_e, zb_e, zc_e, _ints_to_mont([mult]))
    assert np.asarray(got).tolist() == np.asarray(want).tolist()
