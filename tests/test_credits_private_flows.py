"""The flagship credits.aleo private flows, end-to-end on a live ledger:
transfer_public_to_private (shield) -> transfer_private -> wallet scan ->
transfer_private_to_public (unshield) -> double-spend rejection.

Exercises record casts inside the REAL protocol program, finalize
credits accounting, ciphertext outputs, view-key scanning, and the
ledger's serial-number set — the round-trip the reference's
test_credits.rs covers."""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.ledger.ledger import Ledger
from snarkvm_tpu.utils.encoding import bech32m_encode

rng = random.Random(0xC4ED)


def _addr(pk):
    return bech32m_encode("aleo", pk.to_address()[0].to_bytes(32, "little"))


def _amount(rec):
    return rec.data[0][1].value.value.value


@pytest.fixture(scope="module")
def env():
    keys = [account.PrivateKey.new(rng) for _ in range(4)]
    alice, bob = keys[0], account.PrivateKey.new(rng)
    led = Ledger(keys, rng, public_balances={_addr(alice): 10_000_000}, srs=None)
    return led, alice, bob


class TestPrivateCreditsFlows:
    def test_shield(self, env):
        led, alice, bob = env
        p = led.vm.execute(alice, "credits.aleo", "transfer_public_to_private",
                           [_addr(alice), "5000u64"],
                           [("private", "address"), ("public", "u64")])
        b = led.prepare_advance_to_next_beacon_block([p])
        led.advance_to_next_block(b, [p])
        assert led.get_balance(_addr(alice)) == 10_000_000 - 5000
        rec = p.outputs[0]
        assert _amount(rec) == 5000
        type(self).shielded = rec

    def test_private_transfer_and_scan(self, env):
        led, alice, bob = env
        rec = type(self).shielded
        p = led.vm.execute(alice, "credits.aleo", "transfer_private",
                           [rec, _addr(bob), "1200u64"],
                           [("record", "credits"), ("private", "address"),
                            ("private", "u64")])
        b = led.prepare_advance_to_next_beacon_block([p])
        led.advance_to_next_block(b, [p])
        bob_rec, change = p.outputs
        assert _amount(bob_rec) == 1200 and _amount(change) == 3800
        found = led.scan(bob.to_view_key())
        assert [_amount(r[1]) for r in found] == [1200]
        type(self).bob_rec = found[0][1]

    def test_unshield(self, env):
        led, alice, bob = env
        p = led.vm.execute(bob, "credits.aleo", "transfer_private_to_public",
                           [type(self).bob_rec, _addr(bob), "1000u64"],
                           [("record", "credits"), ("private", "address"),
                            ("public", "u64")])
        b = led.prepare_advance_to_next_beacon_block([p])
        led.advance_to_next_block(b, [p])
        assert led.get_balance(_addr(bob)) == 1000

    def test_double_spend_rejected(self, env):
        led, alice, bob = env
        rec = type(self).shielded   # already consumed by transfer_private
        p = led.vm.execute(alice, "credits.aleo", "transfer_private",
                           [rec, _addr(bob), "1u64"],
                           [("record", "credits"), ("private", "address"),
                            ("private", "u64")])
        b = led.prepare_advance_to_next_beacon_block([p])
        with pytest.raises(ValueError, match="serial number"):
            led.check_next_block(b, [p])

    def test_overdraw_halts(self, env):
        led, alice, bob = env
        found = led.scan(bob.to_view_key())
        live = [r for _, r, _ in found]
        # bob's remaining change record holds 200; spending 500 must halt
        small = [r for r in live if _amount(r) == 200]
        assert small, [(_amount(r)) for r in live]
        from snarkvm_tpu.synthesizer.interpreter import HaltError
        with pytest.raises(HaltError):
            led.vm.execute(bob, "credits.aleo", "transfer_private",
                           [small[0], _addr(alice), "500u64"],
                           [("record", "credits"), ("private", "address"),
                            ("private", "u64")])
