"""Fused constant-geometry NTT (ops/ntt_fused.py + ntt_fused_plan.py):
bit-exact vs the O(n^2) golden and the radix-2 engine, incl. inverse,
multi-level sizes, and the stage-twiddle convention."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from snarkvm_tpu.fields import limb
from snarkvm_tpu.ops.ntt import Domain, ntt_py
from snarkvm_tpu.ops import ntt_fused as nf
from snarkvm_tpu.ops.ntt_fused_plan import FusedPlanML, _split
from snarkvm_tpu.params import bls12_377 as P

rng = random.Random(77)
p = P.R
R_INV = pow(limb.FR.R, -1, p)


def _to_lm(xs):
    return jnp.asarray(nf._mont_limbs_np(xs))


def _from_lm(y):
    y = np.asarray(y)
    return [limb.limbs_to_int_py(y[:, i]) * R_INV % p for i in range(y.shape[1])]


def test_split_balanced():
    assert _split(7) == [7]
    assert _split(14) == [7, 7]
    assert _split(18) == [6, 6, 6]
    assert _split(22) == [6, 6, 5, 5]
    assert all(c <= 7 for lg in range(1, 29) for c in _split(lg))
    assert all(sum(_split(lg)) == lg for lg in range(1, 29))


@pytest.mark.parametrize("n", [8, 128, 1024])
def test_fused_matches_golden(n):
    d = Domain(n)
    xs = [rng.randrange(p) for _ in range(n)]
    x = _to_lm(xs)
    f = FusedPlanML(n, d.group_gen, False)
    i = FusedPlanML(n, d.group_gen_inv, True)
    y = f.apply(x)
    if n <= 512:
        assert _from_lm(y) == ntt_py(xs, d)
    else:
        ref = d.fft(x.T)
        want = [limb.limbs_to_int_py(np.asarray(ref[j])) * R_INV % p
                for j in range(n)]
        assert _from_lm(y) == want
    assert _from_lm(i.apply(y)) == xs


def test_fused_three_level():
    n = 1 << 15
    d = Domain(n)
    xs = [rng.randrange(p) for _ in range(n)]
    x = _to_lm(xs)
    f = FusedPlanML(n, d.group_gen, False)
    y = f.apply(x)
    ref = d.fft(x.T)
    assert bool(jnp.all(y == ref.T))
    i = FusedPlanML(n, d.group_gen_inv, True)
    assert _from_lm(i.apply(y)) == xs


def test_pease_stage_convention():
    """The derived constant-geometry twiddle rule matches the direct DFT."""
    n = 16
    d = Domain(n)
    xs = [rng.randrange(p) for _ in range(n)]
    lg = 4

    def bitrev(i, b):
        r = 0
        for k in range(b):
            r |= ((i >> k) & 1) << (b - 1 - k)
        return r

    x = list(xs)
    w = d.group_gen
    for t in range(lg):
        a, b = x[:n // 2], x[n // 2:]
        out = [0] * n
        for k in range(n // 2):
            tw = pow(w, bitrev(k & ((1 << t) - 1), t) * (n >> (t + 1)), p)
            out[2 * k] = (a[k] + tw * b[k]) % p
            out[2 * k + 1] = (a[k] - tw * b[k]) % p
        x = out
    got = [x[bitrev(k, lg)] for k in range(n)]
    assert got == ntt_py(xs, d)
