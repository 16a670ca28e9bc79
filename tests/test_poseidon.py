"""Poseidon vs the reference's checked-in golden vectors
(console/algorithms/src/poseidon/resources/*.snap)."""
import os
import re

import numpy as np
import pytest

from snarkvm_tpu.hashes import poseidon

RES = "/root/reference/console/algorithms/src/poseidon/resources"


def _parse_snap(path):
    text = open(path).read()
    return [int(x) for x in re.findall(r"\d+", text)]


def test_grain_lfsr_first_samples():
    lfsr = poseidon.GrainLFSR(False, 253, 3, 8, 31)
    from snarkvm_tpu.params.bls12_377 import R

    first = lfsr.field_elements_rejection(R, 1)
    second = lfsr.field_elements_rejection(R, 1)
    assert first == _parse_snap(f"{RES}/test_grain_lfsr/first_sample.snap")
    assert second == _parse_snap(f"{RES}/test_grain_lfsr/second_sample.snap")


@pytest.mark.parametrize("rate", [2, 3, 4, 8])
def test_parameters_vs_reference(rate):
    p = poseidon.parameters("fr", rate)
    want_ark = _parse_snap(f"{RES}/test_parameters/rate_{rate}_ark.snap")
    got_ark = [x for row in p.ark for x in row]
    assert got_ark == want_ark
    want_mds = _parse_snap(f"{RES}/test_parameters/rate_{rate}_mds.snap")
    got_mds = [x for row in p.mds for x in row]
    assert got_mds == want_mds


@pytest.mark.parametrize("absorb,squeeze", [(0, 1), (1, 1), (3, 3), (5, 9), (2, 2)])
def test_sponge_vs_reference(absorb, squeeze):
    sp = poseidon.PoseidonSponge(poseidon.parameters("fr", 2))
    sp.absorb_native([1237812] * absorb)
    got = sp.squeeze_native(squeeze)
    want = _parse_snap(f"{RES}/test_sponge/absorb_{absorb}_squeeze_{squeeze}.snap")
    # snap values have 'field' suffix; regex keeps digits only
    assert got == want


HASH_CASES = {
    0: [],
    1: [0],
    2: [1],
    3: [0, 1],
    4: [7, 6],
}


@pytest.mark.parametrize("rate", [2, 4, 8])
@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4])
def test_hash_vs_reference(rate, idx):
    path = f"{RES}/test_hash/rate_{rate}_test_{idx}.snap"
    if not os.path.exists(path):
        pytest.skip("no vector")
    got = poseidon.hash_with_domain("fr", rate, f"Poseidon{rate}", HASH_CASES[idx])
    assert [got] == _parse_snap(path)


def test_batched_permutation_matches_host():
    import jax.numpy as jnp
    from snarkvm_tpu.fields import limb

    p = poseidon.parameters("fr", 2)
    states = [[7, 8, 9], [0, 1, 2]]
    dev = jnp.stack([limb.mont_from_ints(s, limb.FR) for s in states])
    out = poseidon.permute_batched(dev, "fr", 2)
    for i, s in enumerate(states):
        sp = poseidon.PoseidonSponge(p)
        sp.state = list(s)
        sp._permute()
        assert limb.ints_from_mont(out[i], limb.FR) == sp.state
