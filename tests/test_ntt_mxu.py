"""MXU bignum engine (ops/mxu.py) + mixed-radix MXU NTT (ops/ntt_mxu.py):
bit-exact against the O(n^2) golden NTT and the radix-2 engine.

The engine reformulates field DFTs as int8 limb-plane matmuls with
Montgomery reduction as two more fixed matmuls (the TPU-systolic analog
of the reference's CUDA NTT, algorithms/cuda/src/lib.rs:42-69)."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from snarkvm_tpu.fields import limb
from snarkvm_tpu.ops.ntt import Domain, ntt_py
from snarkvm_tpu.ops import ntt_mxu, mxu
from snarkvm_tpu.params import bls12_377 as P

rng = random.Random(1234)
p = P.R
R = limb.FR.R
R_INV = pow(R, -1, p)


def _to_limbs(vals):
    return jnp.asarray(ntt_mxu._ints_to_mont_limbs(vals, p, R))


def _from_limbs(arr):
    arr = np.asarray(arr)
    return [limb.limbs_to_int_py(arr[i]) * R_INV % p for i in range(arr.shape[0])]


@pytest.mark.parametrize("width", [8, 4])
def test_dft_matmul_redc_exact(width):
    mx = mxu.FR8() if width == 8 else mxu.FR4()
    B = 16
    W = np.empty((B, B), dtype=object)
    for i in range(B):
        for j in range(B):
            W[i, j] = rng.randrange(p)
    A = mxu.dft_matrix(mx, W)
    xs = [rng.randrange(p) for _ in range(B)]
    x = jnp.asarray(np.stack([limb.int_to_limbs_py(v, 16) for v in xs]))
    y = mxu.dft_apply(mx, x[None], A, B)[0]
    got = [limb.limbs_to_int_py(np.asarray(y[i])) for i in range(B)]
    want = [sum(int(W[i][j]) * xs[j] for j in range(B)) * R_INV % p
            for i in range(B)]
    assert got == want


def test_redc_worst_case_carries():
    """All-(p-1) inputs produce long 0xFF runs in the product planes —
    exercises the parallel carry prefix."""
    mx = mxu.FR8()
    B = 64
    W = np.full((B, B), p - 1, dtype=object)
    A = mxu.dft_matrix(mx, W)
    xs = [p - 1] * B
    x = jnp.asarray(np.stack([limb.int_to_limbs_py(v, 16) for v in xs]))
    y = mxu.dft_apply(mx, x[None], A, B)[0]
    got = [limb.limbs_to_int_py(np.asarray(y[i])) for i in range(B)]
    want = [B * (p - 1) * (p - 1) % p * R_INV % p] * B
    assert got == want


@pytest.mark.parametrize("n", [8, 64, 512])
def test_ntt_mxu_matches_golden(n):
    d = Domain(n)
    xs = [rng.randrange(p) for _ in range(n)]
    x = _to_limbs(xs)
    y = ntt_mxu.ntt(d, x)
    assert _from_limbs(y) == ntt_py(xs, d)
    z = ntt_mxu.intt(d, y)
    assert _from_limbs(z) == xs


def test_ntt_mxu_matches_radix2_engine():
    n = 256
    d = Domain(n)
    xs = [rng.randrange(p) for _ in range(n)]
    x = _to_limbs(xs)
    got = _from_limbs(ntt_mxu.ntt(d, x))
    ref = d.fft(x)
    assert got == _from_limbs(ref)


def test_ntt_mxu_batched():
    n, batch = 64, 3
    d = Domain(n)
    cols = [[rng.randrange(p) for _ in range(n)] for _ in range(batch)]
    x = jnp.stack([_to_limbs(c) for c in cols])        # [batch, n, L]
    y = ntt_mxu.ntt(d, x)
    for b in range(batch):
        assert _from_limbs(y[b]) == ntt_py(cols[b], d)


def test_par_sub():
    xs = [0, 1, p - 1, 2 * p, 4 * p - 1, (1 << 253) + 12345]
    cs = [1, p, 2 * p, 4 * p]
    a = jnp.asarray(np.stack([limb.int_to_limbs_py(v, 17) for v in xs]).astype(np.int32))
    for c in cs:
        cc = jnp.asarray(limb.int_to_limbs_py(c, 17).astype(np.int32))
        diff, under = mxu._par_sub(a, jnp.broadcast_to(cc, a.shape))
        for i, v in enumerate(xs):
            if v >= c:
                assert not bool(under[i])
                assert limb.limbs_to_int_py(np.asarray(diff[i])) == v - c
            else:
                assert bool(under[i])
