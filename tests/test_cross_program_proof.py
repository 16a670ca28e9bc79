"""Cross-program `call` in the FULL protocol circuit (VERDICT r3
missing #2): a user program calling credits.aleo/transfer_public proves
with the call-site gadget (child tcm + input IDs + output IDs as parent
publics, stack/call/mod.rs:396), the verifier reconstructs the call
graph from the wire transitions (verify_execution.rs:192-203 +
construct_call_graph), and tampered child transitions are rejected."""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.synthesizer.vm import VM, PendingTransaction
from snarkvm_tpu.utils.encoding import bech32m_encode
from snarkvm_tpu.synthesizer.finalize import _key_of
from snarkvm_tpu.console.types import Plaintext, literal_from_str


def _addr_str(pt):
    return bech32m_encode("aleo", pt[0].to_bytes(32, "little"))

PARENT = """import credits.aleo;

program payme.aleo;

function pay:
    input r0 as address.private;
    input r1 as u64.public;
    call credits.aleo/transfer_public_as_signer r0 r1 into r2;
    async pay r2 into r3;
    output r3 as payme.aleo/pay.future;

finalize pay:
    input r0 as credits.aleo/transfer_public_as_signer.future;
    await r0;
"""


@pytest.fixture(scope="module")
def srs():
    return kzg.test_srs(1 << 17)


@pytest.fixture(scope="module")
def env(srs):
    rng = random.Random(2024)
    vm = VM(rng, srs=srs)
    vm.process.deploy(PARENT)
    sk = account.PrivateKey.new(rng)
    addr = sk.to_address()
    vm.store.mapping("credits.aleo", "account").insert(
        _key_of(literal_from_str(_addr_str(addr))),
        Plaintext.literal("u64", 5_000_000))
    return vm, sk, addr


@pytest.fixture(scope="module")
def proven(env):
    vm, sk, addr = env
    rng = random.Random(7)
    dest = account.PrivateKey.new(rng).to_address()
    p = vm.execute(sk, "payme.aleo", "pay",
                   [_addr_str(dest), "1234u64"],
                   [("private", "address"), ("public", "u64")])
    return vm, p, dest


def test_two_transitions_on_the_wire(proven):
    vm, p, dest = proven
    tx = p.transaction
    # post-order: child (credits.aleo/transfer_public) first, root last
    assert [(t.program_id, t.function_name) for t in tx.transitions] == [
        ("credits.aleo", "transfer_public_as_signer"), ("payme.aleo", "pay")]
    assert tx.proof is not None
    for t in tx.transitions:
        assert t.tpk is not None


def test_call_tree_verifies(proven):
    vm, p, _ = proven
    vm._check_transaction_proofs(p.transaction)      # does not raise


def test_independent_verifier_accepts(proven, srs):
    _, p, _ = proven
    rng2 = random.Random(5151)
    vm2 = VM(rng2, srs=srs)
    vm2.process.deploy(PARENT)
    vm2._check_transaction_proofs(p.transaction)     # does not raise


def test_tampered_child_rejected(proven):
    vm, p, _ = proven
    child = p.transaction.transitions[0]
    saved = list(child.outputs)
    child.outputs[0] = (child.outputs[0][0], child.outputs[0][1] ^ 1)
    try:
        with pytest.raises(ValueError, match="invalid execution proof"):
            vm._check_transaction_proofs(p.transaction)
    finally:
        child.outputs[:] = saved


def test_tampered_child_input_rejected(proven):
    """The child's input id is ALSO a parent public (the call-site gadget
    recomputes it from the parent's operands) — flipping it breaks both
    circuits' publics."""
    vm, p, _ = proven
    child = p.transaction.transitions[0]
    saved = list(child.inputs)
    child.inputs[1] = (child.inputs[1][0], child.inputs[1][1] ^ 1)
    try:
        with pytest.raises(ValueError, match="invalid execution proof"):
            vm._check_transaction_proofs(p.transaction)
    finally:
        child.inputs[:] = saved


def test_finalize_runs_child_transfer(env, proven):
    """speculate/finalize: the root future awaits the child
    transfer_public future — balances move."""
    vm, p, dest = proven
    from snarkvm_tpu.synthesizer import finalize as F
    state = F.FinalizeGlobalState.new(1, 1, 0, 0, 0)
    accepted, rejected, _ = vm.speculate([p], state)
    assert accepted == [0] and rejected == []
    vm.finalize()
    bal = vm.store.mapping("credits.aleo", "account").get_confirmed(
        _key_of(literal_from_str(_addr_str(dest))))
    assert bal.value.value == 1234
