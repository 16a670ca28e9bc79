"""Record lifecycle end-to-end: cast (mint) -> transition output commitment
-> spend with serial number -> double-spend rejection at the ledger.

Covers cast.rs:269 (record cast with tvk-derived nonce), request record
inputs (serial numbers from gamma), and the ledger's commitment/serial
bookkeeping (check_next_block)."""
import random

import pytest

from snarkvm_tpu.synthesizer.interpreter import HaltError

from snarkvm_tpu.console import account
from snarkvm_tpu.console.record import Record
from snarkvm_tpu.ledger.ledger import Ledger
from snarkvm_tpu.utils.encoding import bech32m_encode

rng = random.Random(0xABCD)

TOKEN = """program token.aleo;

record token:
    owner as address.private;
    amount as u64.private;

function mint:
    input r0 as address.private;
    input r1 as u64.private;
    cast r0 r1 into r2 as token.record;
    output r2 as token.record;

function burn:
    input r0 as token.record;
    output r0.amount as u64.private;
"""


def _addr(pk):
    return bech32m_encode("aleo", pk.to_address()[0].to_bytes(32, "little"))


@pytest.fixture(scope="module")
def env():
    keys = [account.PrivateKey.new(rng) for _ in range(4)]
    led = Ledger(keys, rng, srs=None)
    led.vm.process.deploy(TOKEN)
    return led, keys[0]


class TestRecordLifecycle:
    def test_mint_records_commitment(self, env):
        led, pk = env
        p = led.vm.execute(pk, "token.aleo", "mint", [_addr(pk), "900u64"],
                           [("private", "address"), ("private", "u64")])
        rec = p.outputs[0]
        assert isinstance(rec, Record)
        block = led.prepare_advance_to_next_beacon_block([p])
        led.advance_to_next_block(block, [p])
        commitment = rec.to_commitment("token.aleo", "token")
        assert commitment in led.commitments
        env_state = (rec,)
        type(self).minted = rec

    def test_spend_consumes_serial_number(self, env):
        led, pk = env
        rec = type(self).minted
        p = led.vm.execute(pk, "token.aleo", "burn", [rec],
                           [("record", "token")])
        # transition input carries the serial number
        kinds = [k for k, _ in p.transaction.transitions[0].inputs]
        assert kinds == ["record"]
        sn = p.transaction.transitions[0].inputs[0][1]
        block = led.prepare_advance_to_next_beacon_block([p])
        led.advance_to_next_block(block, [p])
        assert sn in led.spent_serial_numbers

    def test_double_spend_rejected(self, env):
        led, pk = env
        rec = type(self).minted
        p = led.vm.execute(pk, "token.aleo", "burn", [rec],
                           [("record", "token")])
        block = led.prepare_advance_to_next_beacon_block([p])
        with pytest.raises(ValueError, match="serial number"):
            led.check_next_block(block, [p])

    def test_foreign_record_rejected_at_signing(self, env):
        led, pk = env
        thief = account.PrivateKey.new(rng)
        # mint to pk, then thief tries to spend it
        p = led.vm.execute(pk, "token.aleo", "mint", [_addr(pk), "5u64"],
                           [("private", "address"), ("private", "u64")])
        rec = p.outputs[0]
        with pytest.raises(HaltError, match="belong"):
            led.vm.execute(thief, "token.aleo", "burn", [rec],
                           [("record", "token")])


class TestCiphertextsAndScan:
    def test_output_records_encrypted_and_scannable(self, env):
        led, pk = env
        from snarkvm_tpu.console import network as N
        p = led.vm.execute(pk, "token.aleo", "mint", [_addr(pk), "888u64"],
                           [("private", "address"), ("private", "u64")])
        t = p.transaction.transitions[0]
        assert len(t.output_records) == 1
        commitment, checksum, enc = t.output_records[0]
        assert enc.is_ciphertext
        assert checksum == N.hash_bhp(1024, enc.to_bits_le())
        block = led.prepare_advance_to_next_beacon_block([p])
        led.advance_to_next_block(block, [p])
        # the owner scans it out of the chain; a stranger cannot
        mine = [r for r in led.scan(pk.to_view_key()) if r[0] == commitment]
        assert len(mine) == 1
        assert mine[0][1].data[0][1].value.value.value == 888
        stranger = account.PrivateKey.new(rng).to_view_key()
        assert [r for r in led.scan(stranger) if r[0] == commitment] == []
