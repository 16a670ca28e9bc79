"""In-circuit record commitment (circuit/record_gadget.py) vs the console
Record.to_commitment — the L5 record bit-serialization gadget."""
import random

from snarkvm_tpu.circuit.builder import CircuitBuilder, PRIVATE
from snarkvm_tpu.circuit.types import CField, CInteger, CBool
from snarkvm_tpu.circuit.record_gadget import record_commitment_gadget
from snarkvm_tpu.console.record import Record, Entry
from snarkvm_tpu.console.types import Identifier, Plaintext, INT_WIDTHS
from snarkvm_tpu.console import account, network as N


def test_record_commitment_gadget_matches_console():
    rng = random.Random(0x42C)
    sk = account.PrivateKey.new(rng)
    owner = sk.to_address()
    nonce = N.g_scalar_multiply(rng.randrange(1, 2**250))
    amount = 123_456_789

    record = Record(
        owner=owner, owner_visibility="private",
        data=[(Identifier("amount"),
               Entry("private", Plaintext.literal("u64", amount))),
              (Identifier("flag"),
               Entry("private", Plaintext.literal("boolean", True)))],
        nonce=nonce)
    want = record.to_commitment("token.aleo", "token")

    b = CircuitBuilder()
    owner_g = CField.new(b, PRIVATE, owner[0])
    amount_g = CInteger.new(b, PRIVATE, amount, INT_WIDTHS["u64"], False)
    flag_g = CBool.new(b, PRIVATE, True)
    nonce_g = CField.new(b, PRIVATE, nonce[0])
    got = record_commitment_gadget(
        b, "token.aleo", "token", owner_g,
        [("amount", "private", "u64", amount_g),
         ("flag", "private", "boolean", flag_g)], nonce_g)
    assert b.is_satisfied()
    assert got.value == want

    # tampering with the owner witness breaks the commitment equality
    b2 = CircuitBuilder()
    owner_bad = CField.new(b2, PRIVATE, (owner[0] + 1) % N.R)
    got2 = record_commitment_gadget(
        b2, "token.aleo", "token", owner_bad,
        [("amount", "private", "u64",
          CInteger.new(b2, PRIVATE, amount, INT_WIDTHS["u64"], False)),
         ("flag", "private", "boolean", CBool.new(b2, PRIVATE, True))],
        CField.new(b2, PRIVATE, nonce[0]))
    assert got2.value != want
