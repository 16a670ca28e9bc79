"""Request sign/verify round trip across input visibilities."""
import random

from snarkvm_tpu.console import account, network as N
from snarkvm_tpu.console.request import Request
from snarkvm_tpu.console.record import Record, Entry
from snarkvm_tpu.console.types import Plaintext, Identifier
from snarkvm_tpu.params import bls12_377 as P

rng = random.Random(2024)


def test_request_sign_verify():
    sk = account.PrivateKey.new(rng)
    inputs = [
        Plaintext.literal("u64", 1000),
        Plaintext.literal("field", 42),
    ]
    types = [("public", "u64"), ("private", "field")]
    req = Request.sign(sk, "credits.aleo", "transfer_public", inputs, types, rng)
    assert req.verify(types)
    # tamper with tvk
    req.tvk = (req.tvk + 1) % P.R
    assert not req.verify(types)


def test_request_with_record_input():
    sk = account.PrivateKey.new(rng)
    owner = sk.to_address()
    randomizer = rng.randrange(P.S)
    nonce = N.g_scalar_multiply(randomizer)
    rec = Record(owner, "private",
                 [(Identifier("microcredits"), Entry("private", Plaintext.literal("u64", 5_000_000)))],
                 nonce)
    inputs = [rec, Plaintext.literal("address", owner)]
    types = [("record", "credits"), ("public", "address")]
    req = Request.sign(sk, "credits.aleo", "transfer_private", inputs, types, rng)
    assert req.verify(types)
    # record input id includes a valid serial number
    iid = req.input_ids[0]
    assert iid.kind == "record" and len(iid.fields) == 4
    # another signer cannot claim this record
    other = account.PrivateKey.new(rng)
    from snarkvm_tpu.synthesizer.interpreter import HaltError
    try:
        Request.sign(other, "credits.aleo", "transfer_private", inputs, types, rng)
        assert False, "expected ownership failure"
    except HaltError:
        pass
