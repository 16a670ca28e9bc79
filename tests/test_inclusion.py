"""Inclusion circuit (trace/inclusion/mod.rs to_circuit_assignment): the
in-circuit StatePath walk + serial-number derivation, checked against the
console StatePath.verify and record serial-number math."""
import random

import pytest

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.curves import edwards as ed
from snarkvm_tpu.console import network as N
from snarkvm_tpu.console.state_path import build_state_path, StatePath
from snarkvm_tpu.console.record import serial_number_from_gamma
from snarkvm_tpu.circuit.inclusion_gadget import inclusion_assignment, bhp_commit_gadget
from snarkvm_tpu.circuit.builder import CircuitBuilder, PRIVATE
from snarkvm_tpu.circuit.types import CBool

rng = random.Random(0x1C)


def _sample_state_path(commitment):
    """5-level path with tiny trees (index 0 everywhere)."""
    specs = []
    for n_leaves in (4, 3, 4, 8, 4):
        leaves = None  # filled per level by build_state_path
        specs.append(([commitment if i == 0 else rng.randrange(P.R)
                       for i in range(n_leaves)], 0))
    # build_state_path threads each level's root into the next level's
    # leaves[0]; emulate by rebuilding progressively
    values = [commitment]
    from snarkvm_tpu.console.merkle import MerkleTree, BHPHasher
    from snarkvm_tpu.console.state_path import (_field_leaf, MerklePathStep,
                                                TRANSITION_DEPTH,
                                                TRANSACTION_DEPTH,
                                                TRANSACTIONS_DEPTH,
                                                HEADER_DEPTH, BLOCKS_DEPTH)
    bhp = BHPHasher(1024, 512)
    depths = [TRANSITION_DEPTH, TRANSACTION_DEPTH, TRANSACTIONS_DEPTH,
              HEADER_DEPTH, BLOCKS_DEPTH]
    steps = []
    for lvl, (leaves, index) in enumerate(specs):
        leaves = [values[-1]] + leaves[1:]
        tree = MerkleTree(depths[lvl], bhp, [_field_leaf(l) for l in leaves])
        idx, sibs = tree.prove(index)
        steps.append(MerklePathStep(idx, sibs))
        values.append(tree.root)
    return StatePath(
        global_state_root=values[5],
        transition_leaf=values[0], transition_path=steps[0],
        transaction_id=values[1], transaction_path=steps[1],
        transactions_root=values[2], transactions_path=steps[2],
        header_root=values[3], header_path=steps[3],
        block_hash=values[4], block_path=steps[4],
    )


@pytest.fixture(scope="module")
def fixture():
    gamma = ed.mul(ed.GENERATOR, rng.randrange(1, P.S))
    commitment = rng.randrange(P.R)
    sn = serial_number_from_gamma(gamma, commitment)
    sp = _sample_state_path(commitment)
    assert sp.verify(is_global=True)
    return sp, commitment, gamma, sn


class TestCommitGadget:
    def test_bhp_commit_matches_console(self):
        b = CircuitBuilder()
        bits_v = [rng.randrange(2) == 1 for _ in range(200)]
        r = rng.randrange(1, P.S)
        bits = [CBool.new(b, PRIVATE, v) for v in bits_v]
        rbits = [CBool.new(b, PRIVATE, (r >> i) & 1 == 1) for i in range(251)]
        out = bhp_commit_gadget(b, 512, "AleoBHP512", bits, rbits)
        want = N.commit_bhp(512, list(bits_v), r)
        assert b.value_of(out.lc) == want
        assert b.is_satisfied()


class TestInclusion:
    def test_satisfied_global(self, fixture):
        sp, commitment, gamma, sn = fixture
        b = inclusion_assignment(sp, commitment, gamma, sn,
                                 local_state_root=0, is_global=True)
        assert b.is_satisfied()
        # public layout: [1, gsr, lsr, sn]
        assert b.public[1] == sp.global_state_root
        assert b.public[3] == sn

    def test_satisfied_local(self, fixture):
        sp, commitment, gamma, sn = fixture
        b = inclusion_assignment(sp, commitment, gamma, sn,
                                 local_state_root=sp.transaction_id,
                                 is_global=False)
        assert b.is_satisfied()

    def test_wrong_serial_number_unsatisfied(self, fixture):
        sp, commitment, gamma, sn = fixture
        with pytest.raises(Exception):
            b = inclusion_assignment(sp, commitment, gamma, sn + 1,
                                     local_state_root=0, is_global=True)
            assert not b.is_satisfied()
            raise AssertionError("unsatisfied")

    def test_tampered_path_unsatisfied(self, fixture):
        sp, commitment, gamma, sn = fixture
        import copy
        bad = copy.deepcopy(sp)
        bad.transition_path.siblings[0] = (bad.transition_path.siblings[0] + 1) % P.R
        with pytest.raises(Exception):
            b = inclusion_assignment(bad, commitment, gamma, sn,
                                     local_state_root=0, is_global=True)
            assert not b.is_satisfied()
            raise AssertionError("unsatisfied")


class TestLedgerInclusion:
    def test_real_ledger_path_in_circuit(self):
        import random as _r
        from snarkvm_tpu.console import account
        from snarkvm_tpu.ledger.ledger import Ledger
        from snarkvm_tpu.ledger.query import Query
        from snarkvm_tpu.circuit.inclusion_gadget import ledger_inclusion_assignment
        from snarkvm_tpu.utils.encoding import bech32m_encode
        r2 = _r.Random(0xF00)
        keys = [account.PrivateKey.new(r2) for _ in range(4)]
        led = Ledger(keys, r2, srs=None)
        led.vm.process.deploy("""program token.aleo;

record token:
    owner as address.private;
    amount as u64.private;

function mint:
    input r0 as address.private;
    input r1 as u64.private;
    cast r0 r1 into r2 as token.record;
    output r2 as token.record;
""")
        alice = keys[0]
        addr = bech32m_encode("aleo", alice.to_address()[0].to_bytes(32, "little"))
        p = led.vm.execute(alice, "token.aleo", "mint", [addr, "42u64"],
                           [("private", "address"), ("private", "u64")])
        blk = led.prepare_advance_to_next_beacon_block([p])
        led.advance_to_next_block(blk, [p])
        commitment = p.outputs[0].to_commitment("token.aleo", "token")
        sp = Query(led).get_state_path_for_commitment(commitment)
        gamma = ed.mul(ed.GENERATOR, r2.randrange(1, P.S))
        sn = serial_number_from_gamma(gamma, commitment)
        b = ledger_inclusion_assignment(sp, commitment, gamma, sn)
        assert b.is_satisfied()
        # publics: [1, global_state_root, local_state_root, serial_number]
        # (trace/inclusion/mod.rs:142)
        assert b.public[1] == sp.global_state_root == led.latest_state_root
        assert b.public[3] == sn

        # CircuitInfo parity with the SHIPPED mainnet inclusion verifier
        # key — all six fields exact (constraints 134767, vars 134564,
        # nz profile) when indexed in hiding mode
        import os as _os
        res = "/root/reference/parameters/src/mainnet/resources"
        if _os.path.isdir(res):
            from snarkvm_tpu.snark import varuna as V
            from snarkvm_tpu.params.mainnet_artifacts import credits_verifying_key
            circ = V.index(b.to_synthesizer(), V.VarunaHidingMode)
            vk, _ = credits_verifying_key("inclusion")
            assert circ.info == vk.circuit_info
        # wrong root fails
        import copy
        bad = copy.deepcopy(sp)
        bad.global_state_root += 1
        with pytest.raises(Exception):
            bb = ledger_inclusion_assignment(bad, commitment, gamma, sn)
            assert not bb.is_satisfied()
            raise AssertionError("unsatisfied")
