"""Native C kernels vs the Python golden model."""
import random

import pytest

from snarkvm_tpu.utils import native
from snarkvm_tpu.curves import sw_fast as g1
from snarkvm_tpu.params import bls12_377 as P

rng = random.Random(31337)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_msm_matches_python():
    base = (P.G1_GENERATOR_X, P.G1_GENERATOR_Y)
    pts = [g1.to_affine(g1.mul_int(g1.from_affine(base), rng.randrange(1, P.R))) for _ in range(24)]
    pts[3] = None  # infinity in the batch
    scalars = [rng.randrange(P.R) for _ in range(24)]
    scalars[5] = 0
    got = native.msm_g1(pts, scalars)
    want = g1.msm([p for p in pts if p is not None],
                  [s for p, s in zip(pts, scalars) if p is not None])
    assert g1.to_affine(got) == g1.to_affine(want)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_batch_scalar_mul():
    base = (P.G1_GENERATOR_X, P.G1_GENERATOR_Y)
    scalars = [1, 2, rng.randrange(P.R)]
    got = native.batch_scalar_mul(base, scalars)
    for s, j in zip(scalars, got):
        assert g1.to_affine(j) == g1.to_affine(g1.mul_int(g1.from_affine(base), s))
