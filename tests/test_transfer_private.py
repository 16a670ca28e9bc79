"""The private half of the lifecycle (VERDICT r2 #5 done-criterion):
a record is minted, spent through the FULL transition circuit (in-circuit
Request::verify record arm + record-output encryption) with weak_ops == 0
(strict mode), proved in one batch WITH its ledger inclusion instance,
and the proof-carrying ledger accepts the block / rejects tampering.

Reference: circuit/program/src/request/verify.rs (record arm),
response/from_outputs.rs (record case), trace/mod.rs:260 (inclusion
instances join the batch).
"""
import os
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.ledger.ledger import Ledger
from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.utils.encoding import bech32m_encode

PROGRAM = """program token.aleo;

record token:
    owner as address.private;
    amount as u64.private;

function mint:
    input r0 as address.private;
    input r1 as u64.private;
    cast r0 r1 into r2 as token.record;
    output r2 as token.record;

function transfer:
    input r0 as token.record;
    input r1 as address.private;
    input r2 as u64.private;
    sub r0.amount r2 into r3;
    cast r1 r2 into r4 as token.record;
    cast r0.owner r3 into r5 as token.record;
    output r4 as token.record;
    output r5 as token.record;
"""


@pytest.fixture(scope="module")
def setup():
    os.environ["SNARKVM_TPU_STRICT_CIRCUIT"] = "1"   # no weak witnesses
    rng = random.Random(0xA1E0)
    keys = [account.PrivateKey.new(rng) for _ in range(3)]
    srs = kzg.test_srs(1 << 19)      # inclusion circuit needs ~2^19
    led = Ledger(keys, rng, srs=srs)
    led.vm.process.deploy(PROGRAM)
    alice = keys[0]
    addr = bech32m_encode("aleo", alice.to_address()[0].to_bytes(32, "little"))
    mint = led.vm.execute(alice, "token.aleo", "mint", [addr, "5000u64"],
                          [("private", "address"), ("private", "u64")])
    block = led.prepare_advance_to_next_beacon_block([mint])
    led.advance_to_next_block(block, [mint])
    record = mint.outputs[0]
    yield led, alice, record, rng
    os.environ.pop("SNARKVM_TPU_STRICT_CIRCUIT", None)


def test_mint_proof_carries_record_output(setup):
    led, alice, record, rng = setup
    # the mint block was accepted by a proof-carrying ledger with the
    # record commitment+checksum bound as public inputs
    block = led.get_block(1)
    tx = block.transactions[0]
    assert tx.proof is not None
    t = tx.transitions[0]
    assert t.outputs[0][0] == "record"
    assert getattr(t, "output_records", None), "wire record missing"


def test_transfer_private_proves_with_inclusion(setup):
    led, alice, record, rng = setup
    bob = account.PrivateKey.new(rng)
    bob_addr = bech32m_encode("aleo",
                              bob.to_address()[0].to_bytes(32, "little"))
    p = led.vm.execute(
        alice, "token.aleo", "transfer", [record, bob_addr, "1200u64"],
        [("record", "token"), ("private", "address"), ("private", "u64")])
    tx = p.transaction
    assert tx.proof is not None
    assert tx.global_state_root != 0, "inclusion requires the state root"
    t = tx.transitions[0]
    assert t.inputs[0][0] == "record"           # serial number on the wire
    assert t.input_tags[0] is not None          # tag on the wire
    assert [k for k, _ in t.outputs] == ["record", "record"]
    led.vm._check_transaction_proofs(tx)        # verifies incl. inclusion

    # tampering with the serial number breaks the proof
    saved = t.inputs[0]
    t.inputs[0] = ("record", saved[1] ^ 1)
    with pytest.raises(ValueError):
        led.vm._check_transaction_proofs(tx)
    t.inputs[0] = saved

    # the block carrying the spend validates end-to-end and commits
    block = led.prepare_advance_to_next_beacon_block([p])
    led.check_next_block(block, pending=[p])
    led.advance_to_next_block(block, [p])
    assert led.contains_serial_number(t.inputs[0][1])
