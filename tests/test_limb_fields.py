"""Cross-check the batched JAX limb field vs the Python-int golden model."""
import random

import numpy as np
import pytest
import jax

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.fields import limb

rng = random.Random(0x11B5)


@pytest.mark.parametrize("spec", [limb.FR, limb.FQ, limb.FS], ids=["fr", "fq", "fs"])
def test_roundtrip(spec):
    vals = [rng.randrange(spec.p) for _ in range(8)] + [0, 1, spec.p - 1]
    arr = spec.to_limbs(vals)
    assert spec.from_limbs(arr) == vals
    m = limb.mont_from_ints(vals, spec)
    assert limb.ints_from_mont(m, spec) == vals


@pytest.mark.parametrize("spec", [limb.FR, limb.FQ], ids=["fr", "fq"])
def test_add_sub_neg(spec):
    n = 16
    a = [rng.randrange(spec.p) for _ in range(n)]
    b = [rng.randrange(spec.p) for _ in range(n)]
    a[-1], b[-1] = spec.p - 1, spec.p - 1  # overflow edge
    A, B = spec.to_limbs(a), spec.to_limbs(b)
    assert spec.from_limbs(np.asarray(limb.add(A, B, spec))) == [(x + y) % spec.p for x, y in zip(a, b)]
    assert spec.from_limbs(np.asarray(limb.sub(A, B, spec))) == [(x - y) % spec.p for x, y in zip(a, b)]
    assert spec.from_limbs(np.asarray(limb.neg(A, spec))) == [(-x) % spec.p for x in a]


@pytest.mark.parametrize("spec", [limb.FR, limb.FQ], ids=["fr", "fq"])
def test_mont_mul(spec):
    n = 32
    a = [rng.randrange(spec.p) for _ in range(n)]
    b = [rng.randrange(spec.p) for _ in range(n)]
    a[0], b[0] = spec.p - 1, spec.p - 1
    a[1], b[1] = 0, rng.randrange(spec.p)
    A = limb.mont_from_ints(a, spec)
    B = limb.mont_from_ints(b, spec)
    C = limb.mont_mul(A, B, spec)
    assert limb.ints_from_mont(C, spec) == [x * y % spec.p for x, y in zip(a, b)]


def test_mont_matches_reference_representation():
    # Montgomery residue value must equal a*R mod p (same R as the reference's
    # 4x64/6x64 limbs), e.g. Fr GENERATOR=22 -> 22*R % r (fr.rs:127 doc comment)
    m = limb.mont_from_ints([22], limb.FR)
    got = limb.FR.from_limbs(np.asarray(m))[0]
    assert got == 22 * limb.FR.R % P.R
    assert got == 5642976643016801619665363617888466827793962762719196659561577942948671127251


@pytest.mark.parametrize("spec", [limb.FR, limb.FQ], ids=["fr", "fq"])
def test_pow_inv(spec):
    n = 8
    a = [rng.randrange(1, spec.p) for _ in range(n)]
    A = limb.mont_from_ints(a, spec)
    e = rng.randrange(1, spec.p)
    assert limb.ints_from_mont(limb.pow_const(A, e, spec), spec) == [pow(x, e, spec.p) for x in a]
    assert limb.ints_from_mont(limb.inv(A, spec), spec) == [pow(x, -1, spec.p) for x in a]


def test_jit_and_grad_shapes():
    f = jax.jit(lambda x, y: limb.mont_mul(x, y, limb.FR))
    a = limb.mont_from_ints([3, 5], limb.FR)
    out = f(a, a)
    assert out.shape == (2, limb.FR.L) and out.dtype == np.uint32
