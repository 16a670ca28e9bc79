"""Circuit layer: gadgets + Poseidon gadget, proven end-to-end with Varuna."""
import random

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.circuit.builder import CircuitBuilder, PUBLIC, PRIVATE
from snarkvm_tpu.circuit.types import CField, CBool, CInteger, CGroup
from snarkvm_tpu.circuit import poseidon_gadget
from snarkvm_tpu.console import network as N
from snarkvm_tpu.curves import edwards as ed
from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.snark import varuna

R = P.R
rng = random.Random(99)


def test_field_gadgets():
    b = CircuitBuilder()
    x = CField.new(b, PRIVATE, 7)
    y = CField.new(b, PRIVATE, 9)
    z = x * y
    assert z.value == 63
    inv = x.inverse()
    assert inv.value == pow(7, -1, R)
    eq = x.is_equal(y)
    assert not eq.value
    eq2 = x.is_equal(CField.new(b, PRIVATE, 7))
    assert eq2.value
    t = x.ternary(eq2, y)
    assert t.value == 7
    assert b.is_satisfied()


def test_bool_int_gadgets():
    b = CircuitBuilder()
    t = CBool.new(b, PRIVATE, True)
    f = CBool.new(b, PRIVATE, False)
    assert (t & f).value is False and (t | f).value is True and (t ^ t).value is False
    a = CInteger.new(b, PRIVATE, 200, 8)
    c = CInteger.new(b, PRIVATE, 55, 8)
    assert a.add_checked(c).value == 255
    w = CInteger.new(b, PRIVATE, 200, 8).add_wrapped(CInteger.new(b, PRIVATE, 100, 8))
    assert w.value == (300 % 256)
    assert b.is_satisfied()


def test_group_gadget():
    b = CircuitBuilder()
    g = ed.GENERATOR
    p1 = ed.mul(g, 5)
    p2 = ed.mul(g, 11)
    c1 = CGroup.new(b, PRIVATE, p1)
    c2 = CGroup.new(b, PRIVATE, p2)
    s = c1 + c2
    assert s.value == ed.mul(g, 16)
    assert b.is_satisfied()


def test_poseidon_gadget_matches_console():
    b = CircuitBuilder()
    inputs = [CField.new(b, PRIVATE, 123), CField.new(b, PRIVATE, 456)]
    out = poseidon_gadget.hash_psd(b, 2, inputs)[0]
    assert out.value == N.hash_psd(2, [123, 456])
    assert b.is_satisfied()


def test_prove_circuit_poseidon():
    """The e2e slice: synthesize a hash circuit, prove it with Varuna."""
    b = CircuitBuilder()
    expected = N.hash_psd(2, [77, 88])
    pub = CField.new(b, PUBLIC, expected)
    inputs = [CField.new(b, PRIVATE, 77), CField.new(b, PRIVATE, 88)]
    out = poseidon_gadget.hash_psd(b, 2, inputs)[0]
    pub.assert_eq(out)
    assert b.is_satisfied()
    synth = b.to_synthesizer()

    srs = kzg.test_srs(4096)
    pk, vk = varuna.circuit_setup(srs, synth)
    proof = varuna.prove_batch(srs, [(pk, [synth])], rng)
    assert varuna.verify_batch(srs, [(vk, [[1, expected]])], proof)
    bad = (expected + 1) % R
    assert not varuna.verify_batch(srs, [(vk, [[1, bad]])], proof)


def test_bhp_gadget_matches_console():
    import random as _r
    from snarkvm_tpu.circuit.bhp_gadget import bhp_hash_gadget_check
    rr = _r.Random(4)
    b = CircuitBuilder()
    bits = [bool(rr.randrange(2)) for _ in range(96)]
    out, console = bhp_hash_gadget_check(b, 256, "AleoBHP256", bits)
    assert out.value == console
    assert b.is_satisfied()


def test_merkle_path_gadget():
    import random as _r
    from snarkvm_tpu.console.merkle import MerkleTree, BHPHasher
    from snarkvm_tpu.console.types import int_to_bits_le
    from snarkvm_tpu.circuit.merkle_gadget import (
        verify_merkle_path_gadget, hash_leaf_gadget)
    rr = _r.Random(6)
    leaves = [int_to_bits_le(rr.randrange(1 << 64), 64) for _ in range(4)]
    tree = MerkleTree(3, BHPHasher(), leaves)
    idx, sibs = tree.prove(2)
    b = CircuitBuilder()
    leaf_bits = [CBool.new(b, PRIVATE, bit) for bit in leaves[2]]
    leaf_hash = hash_leaf_gadget(b, leaf_bits)
    index_bits = [CBool.new(b, PRIVATE, (idx >> i) & 1 == 1) for i in range(3)]
    sib_fields = [CField.new(b, PRIVATE, s) for s in sibs]
    root = CField.new(b, PUBLIC, tree.root)
    verify_merkle_path_gadget(b, leaf_hash, index_bits, sib_fields, root)
    assert b.is_satisfied()
    # wrong root -> unsatisfied
    b2 = CircuitBuilder()
    leaf_bits2 = [CBool.new(b2, PRIVATE, bit) for bit in leaves[2]]
    lh2 = hash_leaf_gadget(b2, leaf_bits2)
    ib2 = [CBool.new(b2, PRIVATE, (idx >> i) & 1 == 1) for i in range(3)]
    sf2 = [CField.new(b2, PRIVATE, s) for s in sibs]
    bad_root = CField.new(b2, PUBLIC, (tree.root + 1) % varuna.R)
    verify_merkle_path_gadget(b2, lh2, ib2, sf2, bad_root)
    assert not b2.is_satisfied()
