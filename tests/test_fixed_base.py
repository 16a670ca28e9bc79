"""Fixed-base windowed MSM (reference algorithms/src/msm/fixed_base.rs:87)."""
import random

from snarkvm_tpu.ops import fixed_base as fb
from snarkvm_tpu.curves import sw_fast as g1f
from snarkvm_tpu.params import bls12_377 as P


BASE = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))


def _norm(j):
    return (0, 1, 0) if j[2] == 0 else g1f.to_affine(j)


def test_host_fixed_base_matches_scalar_mul():
    rng = random.Random(11)
    scalars = [0, 1, 2, P.R - 1] + [rng.randrange(P.R) for _ in range(12)]
    got = fb.fixed_base_msm(BASE, scalars, c=4)
    for s, g in zip(scalars, got):
        want = g1f.mul_int(BASE, s)
        if want[2] == 0 or g[2] == 0:
            assert want[2] == 0 and g[2] == 0
        else:
            assert _norm(g) == _norm(want)


def test_device_fixed_base_matches_host():
    rng = random.Random(12)
    scalars = [rng.randrange(P.R) for _ in range(9)] + [0]
    got = fb.fixed_base_msm_lm(BASE, scalars, c=8)
    want = fb.fixed_base_msm(BASE, scalars, c=8)
    for g, w in zip(got, want):
        if w[2] == 0 or g[2] == 0:
            assert w[2] == 0 and g[2] == 0
        else:
            assert _norm(g) == _norm(w)


def test_window_size_heuristic():
    assert fb.get_mul_window_size(4) == 3
    assert fb.get_mul_window_size(1 << 20) >= 10
