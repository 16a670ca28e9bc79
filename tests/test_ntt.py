"""NTT correctness vs O(n^2) golden evaluation (ref: algorithms/src/fft/tests.rs strategy)."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from snarkvm_tpu.fields import limb
from snarkvm_tpu.ops.ntt import Domain, ntt_py

rng = random.Random(0x0177)


@pytest.mark.parametrize("n", [1, 2, 8, 64])
def test_fft_matches_golden(n):
    d = Domain(n)
    coeffs = [rng.randrange(limb.FR.p) for _ in range(n)]
    dev = limb.mont_from_ints(coeffs, limb.FR)
    got = limb.ints_from_mont(d.fft(dev), limb.FR)
    assert got == ntt_py(coeffs, d)


@pytest.mark.parametrize("n", [8, 32])
def test_ifft_roundtrip(n):
    d = Domain(n)
    coeffs = [rng.randrange(limb.FR.p) for _ in range(n)]
    dev = limb.mont_from_ints(coeffs, limb.FR)
    back = limb.ints_from_mont(d.ifft(d.fft(dev)), limb.FR)
    assert back == coeffs


def test_coset_roundtrip_and_semantics():
    n = 16
    d = Domain(n)
    coeffs = [rng.randrange(limb.FR.p) for _ in range(n)]
    dev = limb.mont_from_ints(coeffs, limb.FR)
    ev = limb.ints_from_mont(d.coset_fft(dev), limb.FR)
    # coset evals = poly evaluated at generator * w^j
    p = limb.FR.p
    g = d.generator
    for j in [0, 1, 5]:
        x = g * pow(d.group_gen, j, p) % p
        want = 0
        for c in reversed(coeffs):
            want = (want * x + c) % p
        assert ev[j] == want
    back = limb.ints_from_mont(d.coset_ifft(d.coset_fft(dev)), limb.FR)
    assert back == coeffs


def test_batched_leading_dims():
    n = 8
    d = Domain(n)
    a = [rng.randrange(limb.FR.p) for _ in range(n)]
    b = [rng.randrange(limb.FR.p) for _ in range(n)]
    batch = jnp.stack([limb.mont_from_ints(a, limb.FR), limb.mont_from_ints(b, limb.FR)])
    out = d.fft(batch)
    assert limb.ints_from_mont(out[0], limb.FR) == ntt_py(a, d)
    assert limb.ints_from_mont(out[1], limb.FR) == ntt_py(b, d)
