"""Inclusion instances inside prove_execution batches (trace/mod.rs:260
prove_batch: inclusion-circuit assignments join the function circuits in
ONE batched Varuna proof). A record is minted on a live ledger; spending
context (commitment, gamma, serial number) goes through Trace.prepare
(Query state path) and the batch proof verifies end-to-end."""
import random as _r

import pytest

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.console import account
from snarkvm_tpu.console.record import serial_number_from_gamma
from snarkvm_tpu.console.request import Request
from snarkvm_tpu.curves import edwards as ed
from snarkvm_tpu.ledger.ledger import Ledger
from snarkvm_tpu.ledger.query import Query
from snarkvm_tpu.synthesizer import execute as E
from snarkvm_tpu.snark import varuna
from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.utils.encoding import bech32m_encode

PROGRAM = """program incl_batch.aleo;

record token:
    owner as address.private;
    amount as u64.private;

function mint:
    input r0 as address.private;
    input r1 as u64.private;
    cast r0 r1 into r2 as token.record;
    output r2 as token.record;

function compute:
    input r0 as field.private;
    mul r0 r0 into r1;
    output r1 as field.private;
"""


@pytest.fixture(scope="module")
def setup():
    rng = _r.Random(0x1AC)
    keys = [account.PrivateKey.new(rng) for _ in range(4)]
    led = Ledger(keys, rng, srs=None)
    led.vm.process.deploy(PROGRAM)
    alice = keys[0]
    addr = bech32m_encode("aleo", alice.to_address()[0].to_bytes(32, "little"))
    p = led.vm.execute(alice, "incl_batch.aleo", "mint", [addr, "7u64"],
                       [("private", "address"), ("private", "u64")])
    block = led.prepare_advance_to_next_beacon_block([p])
    led.advance_to_next_block(block)
    commitment = next(v for t in block.transactions[0].transitions
                      for k, v in t.outputs if k == "record")
    srs = kzg.test_srs(1 << 19)   # inclusion circuit is ~190k constraints
    return led, alice, commitment, srs, rng


def test_inclusion_joins_the_execution_batch(setup):
    led, alice, commitment, srs, rng = setup
    stack = led.vm.process.get_stack("incl_batch.aleo")

    # a normal function trace...
    from snarkvm_tpu.console.types import Plaintext
    req = Request.sign(alice, "incl_batch.aleo", "compute",
                       [Plaintext.literal("field", 5)],
                       [("private", "field")], rng)
    trace = E.Trace()
    trace.insert(E.execute_function(stack, req, [("private", "field")]))

    # ...plus an inclusion instance for the minted record
    gamma = ed.mul(ed.hash_to_group_psd(commitment)
                   if hasattr(ed, "hash_to_group_psd") else ed.GENERATOR,
                   alice.sk_sig % P.S)
    sn = serial_number_from_gamma(gamma, commitment)
    trace.insert_inclusion(commitment, gamma, sn)
    trace.prepare(Query(led))

    proof, vks = trace.prove_execution(srs, rng)
    assert E.verify_execution(srs, proof, vks)
    keys = [k for k, _, _ in vks]
    assert E.INCLUSION_KEY in keys
    # the inclusion instance's publics: [1, global_state_root,
    # local_state_root, serial_number] (trace/inclusion/mod.rs:142)
    _, _, pubs = next(v for v in vks if v[0] == E.INCLUSION_KEY)
    assert pubs[0][1] == led.latest_state_root
    assert pubs[0][3] == sn

    # a corrupted serial number must not verify
    bad = [(k, vk, ([[p_[0], p_[1], p_[2], p_[3] + 1]] if k == E.INCLUSION_KEY else ins))
           for (k, vk, ins) in vks for p_ in [ins[0]]]
    assert not E.verify_execution(srs, proof, bad)


def test_prepare_required_when_record_inputs_exist(setup):
    led, alice, commitment, srs, rng = setup
    trace = E.Trace()
    gamma = ed.mul(ed.GENERATOR, 5)
    trace.insert_inclusion(commitment, gamma,
                           serial_number_from_gamma(gamma, commitment))
    with pytest.raises(ValueError, match="prepare"):
        trace.prove_execution(srs, rng)
