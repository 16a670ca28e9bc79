"""Varuna end-to-end: setup -> prove -> verify (self-consistency + soundness)."""
import random

import pytest

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.snark import varuna, r1cs

R = P.R
rng = random.Random(0x5A5A)


class MulCircuit(r1cs.ConstraintSynthesizer):
    """Prove knowledge of a, b with a*b = c (c public), plus filler constraints."""

    def __init__(self, a, b, num_extra=5):
        self.a = a % R
        self.b = b % R
        self.num_extra = num_extra

    def generate_constraints(self, cs):
        c_pub = cs.alloc_input(self.a * self.b % R)
        a = cs.alloc(self.a)
        b = cs.alloc(self.b)
        cs.enforce([(1, a)], [(1, b)], [(1, c_pub)])
        # filler: x_i * x_i = x_{i+1} chain
        prev, prev_val = a, self.a
        for _ in range(self.num_extra):
            nxt_val = prev_val * prev_val % R
            nxt = cs.alloc(nxt_val)
            cs.enforce([(1, prev)], [(1, prev)], [(1, nxt)])
            prev, prev_val = nxt, nxt_val

    def public_inputs(self):
        return [1, self.a * self.b % R]


@pytest.fixture(scope="module")
def srs():
    return kzg.test_srs(128)


def test_prove_verify_single(srs):
    circ = MulCircuit(7, 6)
    pk, vk = varuna.circuit_setup(srs, circ)
    proof = varuna.prove_batch(srs, [(pk, [circ])], rng)
    assert varuna.verify_batch(srs, [(vk, [circ.public_inputs()])], proof)


def test_verify_rejects_wrong_input(srs):
    circ = MulCircuit(7, 6)
    pk, vk = varuna.circuit_setup(srs, circ)
    proof = varuna.prove_batch(srs, [(pk, [circ])], rng)
    bad = [1, (7 * 6 + 1) % R]
    assert not varuna.verify_batch(srs, [(vk, [bad])], proof)


def test_prove_verify_multi_instance(srs):
    instances = [MulCircuit(3, 5), MulCircuit(11, 13), MulCircuit(2, 9)]
    pk, vk = varuna.circuit_setup(srs, instances[0])
    proof = varuna.prove_batch(srs, [(pk, instances)], rng)
    inputs = [i.public_inputs() for i in instances]
    assert varuna.verify_batch(srs, [(vk, inputs)], proof)


def test_prove_verify_zk(srs):
    mode = varuna.VarunaHidingMode
    circ = MulCircuit(4, 9)
    pk, vk = varuna.circuit_setup(srs, circ, mode)
    proof = varuna.prove_batch(srs, [(pk, [circ])], rng, mode)
    assert proof.is_hiding()
    assert varuna.verify_batch(srs, [(vk, [circ.public_inputs()])], proof, mode)


class SquareCircuit(r1cs.ConstraintSynthesizer):
    """x^2 = y (y public) with a different structure than MulCircuit."""

    def __init__(self, x):
        self.x = x % R

    def generate_constraints(self, cs):
        y = cs.alloc_input(self.x * self.x % R)
        x = cs.alloc(self.x)
        cs.enforce([(1, x)], [(1, x)], [(1, y)])
        z = cs.alloc(self.x * self.x % R * self.x % R)
        cs.enforce([(1, x)], [(1, y)], [(1, z)])

    def public_inputs(self):
        return [1, self.x * self.x % R]


def test_prove_verify_multi_circuit(srs):
    m1, m2 = MulCircuit(3, 5), MulCircuit(7, 2)
    s1, s2 = SquareCircuit(4), SquareCircuit(10)
    pk_a, vk_a = varuna.circuit_setup(srs, m1)
    pk_b, vk_b = varuna.circuit_setup(srs, s1)
    keys = [(pk_a, [m1, m2]), (pk_b, [s1, s2])]
    # keys_to_constraints is a BTreeMap keyed by pk in the reference;
    # we keep list order stable and sort by circuit id for parity
    keys.sort(key=lambda kv: kv[0].circuit.id)
    proof = varuna.prove_batch(srs, keys, rng)
    inputs = [(pk.vk, [c.public_inputs() for c in cs_]) for pk, cs_ in keys]
    assert varuna.verify_batch(srs, [(vk, i) for (vk, i) in inputs], proof)


def test_certificate_prove_verify_vk(srs):
    circ = MulCircuit(5, 5)
    pk, vk = varuna.circuit_setup(srs, circ)
    cert = varuna.prove_vk(srs, pk)
    assert varuna.verify_vk(srs, circ, vk, cert)
    # a different circuit cannot pass this vk's certificate
    other = MulCircuit(5, 5, num_extra=7)
    assert not varuna.verify_vk(srs, other, vk, cert)


def test_prove_verify_zk_presynthesized_assignment(srs):
    """ZK prove_batch accepts a pre-synthesized ConstraintSystem
    (varuna.rs:336 takes assignments in all modes; the prover clones and
    randomizes, leaving the caller's assignment untouched)."""
    mode = varuna.VarunaHidingMode
    circ = MulCircuit(4, 9)
    pk, vk = varuna.circuit_setup(srs, circ, mode)
    cs = r1cs.ConstraintSystem()
    circ.generate_constraints(cs)
    cs.pad_input_to_power_of_two()
    before = (len(cs.public), len(cs.private), len(cs.a))
    proof = varuna.prove_batch(srs, [(pk, [cs])], rng, mode)
    assert proof.is_hiding()
    assert (len(cs.public), len(cs.private), len(cs.a)) == before
    assert varuna.verify_batch(srs, [(vk, [circ.public_inputs()])], proof, mode)
