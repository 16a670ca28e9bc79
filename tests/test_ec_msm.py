"""Batched EC ops + Pippenger MSM vs the scalar golden model."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.fields import limb
from snarkvm_tpu.fields.scalar import Fq
from snarkvm_tpu.curves import sw, edwards
from snarkvm_tpu.ops import ec, msm

rng = random.Random(0x35E1)


def _rand_g1(n):
    """Random G1 points (as int affine tuples) via scalar muls of the generator."""
    return [sw.G1.mul(sw.G1.generator, rng.randrange(1, P.R)) for _ in range(n)]


def _aff(pt):
    return None if pt is None else (pt[0].v, pt[1].v)


class TestG1Batched:
    def test_add_double_vs_scalar(self):
        pts = _rand_g1(4)
        a = ec.g1_from_affine_ints([_aff(p) for p in pts])
        b = ec.g1_from_affine_ints([_aff(pts[1]), _aff(pts[0]), _aff(pts[2]), _aff(pts[3])])
        out = ec.g1_to_affine_ints(ec.g1_add(a, b))
        want = [
            sw.G1.to_affine(sw.G1.jac_add(sw.G1.to_jacobian(p), sw.G1.to_jacobian(q)))
            for p, q in [(pts[0], pts[1]), (pts[1], pts[0]), (pts[2], pts[2]), (pts[3], pts[3])]
        ]
        assert out == [_aff(w) for w in want]

    def test_edge_cases(self):
        g = _aff(sw.G1.generator)
        neg_g = (g[0], P.Q - g[1])
        a = ec.g1_from_affine_ints([g, g, None, g])
        b = ec.g1_from_affine_ints([neg_g, None, g, g])
        out = ec.g1_to_affine_ints(ec.g1_add(a, b))
        dbl = _aff(sw.G1.mul(sw.G1.generator, 2))
        assert out == [None, g, g, dbl]


class TestEdwardsBatched:
    def test_add_vs_scalar(self):
        pts = [edwards.mul(edwards.GENERATOR, rng.randrange(1, edwards.ORDER)) for _ in range(4)]
        a = ec.ed_from_affine_ints(pts)
        b = ec.ed_from_affine_ints([pts[1], pts[0], pts[2], pts[3]])
        out = ec.ed_to_affine_ints(ec.ed_add(a, b))
        want = [edwards.add(p, q) for p, q in
                [(pts[0], pts[1]), (pts[1], pts[0]), (pts[2], pts[2]), (pts[3], pts[3])]]
        assert out == want

    def test_identity(self):
        g = edwards.GENERATOR
        a = ec.ed_from_affine_ints([g])
        ident = ec.ed_identity((1,))
        out = ec.ed_to_affine_ints(ec.ed_add(a, ident))
        assert out == [g]


class TestMSM:
    @pytest.mark.parametrize("n,c,bits", [(8, 4, 16), (32, 8, 24)])
    def test_msm_g1(self, n, c, bits):
        # small-bit scalars keep the window count (and XLA graph) small in CI;
        # full 253-bit scalars exercise the same code path with more windows.
        pts = _rand_g1(n)
        scalars = [rng.randrange(1 << bits) for _ in range(n)]
        scalars[0] = 0  # zero-scalar edge
        pts_dev = ec.g1_from_affine_ints([_aff(p) for p in pts])
        sc_dev = jnp.asarray(limb.FR.to_limbs(scalars))
        got = ec.g1_to_affine_ints(msm.msm_g1(pts_dev, sc_dev, c=c, num_bits=bits))[0]
        want = _aff(sw.G1.msm_naive(pts, scalars))
        assert got == want

    def test_msm_edwards(self):
        n, c, bits = 16, 4, 16
        pts = [edwards.mul(edwards.GENERATOR, rng.randrange(1, edwards.ORDER)) for _ in range(n)]
        scalars = [rng.randrange(1 << bits) for _ in range(n)]
        pts_dev = ec.ed_from_affine_ints(pts)
        sc_dev = jnp.asarray(limb.FS.to_limbs(scalars))
        got = ec.ed_to_affine_ints(msm.msm_edwards(pts_dev, sc_dev, c=c, num_bits=bits))[0]
        acc = edwards.IDENTITY_AFFINE
        for pt, s in zip(pts, scalars):
            acc = edwards.add(acc, edwards.mul(pt, s))
        assert got == acc


def test_msm_multi_matches_single():
    """k scalar sets over the same points in one fused dispatch."""
    import random
    from snarkvm_tpu.ops import ec_pallas as ep
    from snarkvm_tpu.curves import sw_fast as g1f
    from snarkvm_tpu.params import bls12_377 as P

    rng = random.Random(31)
    n, k = 96, 3
    base = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
    pts, cur = [], base
    for _ in range(n):
        pts.append(g1f.to_affine(cur))
        cur = g1f.jac_add(cur, g1f.jac_double(cur))
    plm = ep.g1_from_affine_lm_fast(pts)
    sets = [[rng.randrange(P.R) for _ in range(n)] for _ in range(k)]
    limbs = [ep.scalars_to_limbs(s) for s in sets]
    multi = ep.msm_g1_lm_multi(plm, limbs, n, c=6)
    for s_limbs, got in zip(limbs, multi):
        want = ep.msm_g1_lm(plm, s_limbs, n, c=6)
        assert g1f.to_affine(got) == g1f.to_affine(want)
