"""Proof-carrying VM/ledger lifecycle (VERDICT r2 #4).

The reference's VM::execute ends in Trace::prove_execution and every
check_transaction runs verify_execution (synthesizer/src/vm/execute.rs:27,
vm/verify.rs:70, process/src/verify_execution.rs:22): transactions carry
a batched Varuna proof and the chain REJECTS unproven/tampered state
transitions. These tests drive that wiring end-to-end on a small program.
"""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.synthesizer.vm import VM

PROGRAM = """
program proofy.aleo;

function double:
    input r0 as u32.private;
    add r0 r0 into r1;
    output r1 as u32.private;
"""


@pytest.fixture(scope="module")
def srs():
    return kzg.test_srs(1 << 16)


@pytest.fixture(scope="module")
def proven(srs):
    """One proof-carrying transaction, shared across the checks below."""
    rng = random.Random(77)
    vm = VM(rng, srs=srs)
    vm.process.deploy(PROGRAM)
    sk = account.PrivateKey.new(rng)
    p = vm.execute(sk, "proofy.aleo", "double", ["21u32"],
                   [("private", "u32")])
    return vm, p


def test_execute_attaches_proof(proven):
    vm, p = proven
    tx = p.transaction
    assert tx.proof is not None
    t = tx.transitions[0]
    # protocol-grade transition data: tpk + in-circuit output IDs
    assert t.tpk is not None
    assert len(t.outputs) == 1 and t.outputs[0][0] == "private"
    vm._check_transaction_proofs(tx)   # does not raise


def test_unproven_transaction_rejected(proven):
    vm, p = proven
    saved = p.transaction.proof
    p.transaction.proof = None
    try:
        with pytest.raises(ValueError, match="carries no proof"):
            vm._check_transaction_proofs(p.transaction)
    finally:
        p.transaction.proof = saved


def test_tampered_transition_rejected(proven):
    vm, p = proven
    t = p.transaction.transitions[0]
    saved = list(t.outputs)
    t.outputs[0] = (t.outputs[0][0], t.outputs[0][1] ^ 1)
    try:
        with pytest.raises(ValueError, match="invalid execution proof"):
            vm._check_transaction_proofs(p.transaction)
    finally:
        t.outputs[:] = saved


def test_independent_verifier_accepts(proven, srs):
    """A verifier VM that shares NOTHING with the prover synthesizes its
    own verifying keys from the program text and accepts the proof —
    prover/verifier circuit identity (verify_deployment.rs's
    re-synthesis contract)."""
    _, p = proven
    rng2 = random.Random(5150)
    vm2 = VM(rng2, srs=srs)
    vm2.process.deploy(PROGRAM)
    vm2._check_transaction_proofs(p.transaction)   # does not raise


def test_ledger_rejects_tampered_block(proven, srs):
    """check_next_block re-verifies proofs: a block holding a tampered
    execute-transaction is rejected (check_next_block.rs →
    VM::check_transactions)."""
    from snarkvm_tpu.ledger.ledger import Ledger
    rng = random.Random(99)
    keys = [account.PrivateKey.new(rng) for _ in range(3)]
    led = Ledger(keys, rng, srs=srs)
    led.vm.process.deploy(PROGRAM)
    _, p = proven
    block = led.prepare_advance_to_next_beacon_block([p])
    led.check_next_block(block, pending=[p])       # sane block passes
    t = block.transactions[0].transitions[0]
    t.outputs[0] = (t.outputs[0][0], t.outputs[0][1] ^ 1)
    # keep the Merkle roots consistent so the PROOF check is what fails
    from snarkvm_tpu.ledger.block import transactions_root
    block.header.transactions_root = transactions_root(block.transactions)
    with pytest.raises(ValueError, match="proof"):
        led.check_next_block(block, pending=None)


def test_fee_binding_enforced():
    """The fee transition's third input id must bind the body's
    execution id (verify_fee.rs deployment_or_execution_id check):
    swapping the body under an existing fee is rejected. Dev-mode
    (srs=None) exercise — the binding check is pure hashing."""
    rng = random.Random(31)
    vm = VM(rng)
    vm.process.deploy(PROGRAM)
    sk = account.PrivateKey.new(rng)
    addr = sk.to_address()
    vm.store.mapping("credits.aleo", "account").insert(
        addr, 10_000_000_000)
    p = vm.execute(sk, "proofy.aleo", "double", ["21u32"],
                   [("private", "u32")], priority_fee=0)
    vm.check_transaction(p)   # bound fee passes
    # re-bind attack: replace the body with a different execution
    p2 = vm.execute(sk, "proofy.aleo", "double", ["33u32"],
                    [("private", "u32")])
    tampered = type(p.transaction)(
        "execute",
        [p2.transaction.transitions[0], p.transaction.transitions[1]])
    from snarkvm_tpu.synthesizer.vm import PendingTransaction
    with pytest.raises(ValueError, match="fee is not bound"):
        vm.check_transaction(PendingTransaction(tampered, []))


def test_unknown_state_root_rejected(proven, srs):
    """check_next_block rejects record-spending transactions whose
    global_state_root this ledger never produced (ADVICE r3 high:
    fabricated-chain inclusion-proof attack)."""
    from snarkvm_tpu.ledger.ledger import Ledger
    rng = random.Random(123)
    keys = [account.PrivateKey.new(rng) for _ in range(3)]
    led = Ledger(keys, rng, srs=srs)
    led.vm.process.deploy(PROGRAM)
    _, p = proven
    block = led.prepare_advance_to_next_beacon_block([p])
    tx = block.transactions[0]
    # graft a record input + a foreign state root onto the wire tx
    t = tx.transitions[0]
    saved_inputs, saved_root = list(t.inputs), tx.global_state_root
    t.inputs.append(("record", 1234567))
    tx.global_state_root = 0xDEAD
    from snarkvm_tpu.ledger.block import transactions_root
    block.header.transactions_root = transactions_root(block.transactions)
    try:
        with pytest.raises(ValueError, match="unknown global state root"):
            led.check_next_block(block, pending=None)
    finally:
        t.inputs[:] = saved_inputs
        tx.global_state_root = saved_root


def test_default_ledger_is_proof_carrying():
    """Default-constructed Ledger carries the dev SRS and rejects
    unproven execute-transactions (the reference has no proof-less mode,
    vm/verify.rs:70; srs=None is the explicit dev opt-out)."""
    from snarkvm_tpu.ledger.ledger import Ledger
    rng = random.Random(17)
    keys = [account.PrivateKey.new(rng) for _ in range(3)]
    led = Ledger(keys, rng)              # no srs argument
    assert led.vm.srs is not None
    vm_dev = VM(rng)                     # proof-less VM builds the tx
    vm_dev.process.deploy(PROGRAM)
    sk = account.PrivateKey.new(rng)
    p = vm_dev.execute(sk, "proofy.aleo", "double", ["21u32"],
                       [("private", "u32")])
    with pytest.raises(ValueError, match="carries no proof"):
        led.vm._check_transaction_proofs(p.transaction)
