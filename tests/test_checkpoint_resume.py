"""Checkpoint/resume (SURVEY §5.4): the ledger IS the checkpoint —
Ledger.load rebuilds the in-memory caches from the persisted SQLite
finalize + block stores without re-running finalize."""
import random

import pytest

from snarkvm_tpu.console.account import PrivateKey
from snarkvm_tpu.ledger.ledger import Ledger


@pytest.fixture()
def keys():
    rng = random.Random(0xCE)
    return [PrivateKey.new(rng) for _ in range(3)], rng


def _addr(key):
    from snarkvm_tpu.utils.encoding import bech32m_encode
    return bech32m_encode("aleo", key.to_address()[0].to_bytes(32, "little"))


def test_resume_restores_chain_and_balances(tmp_path, keys):
    ks, rng = keys
    path = str(tmp_path / "ledger.db")
    alice, bob = ks[0], ks[1]
    led = Ledger(ks, rng, public_balances={_addr(alice): 1_000_000},
                 store_path=path, srs=None)
    led.vm.process.deploy(
        "program cr.aleo;\nfunction bump:\n    input r0 as u64.public;\n"
        "    add r0 1u64 into r1;\n    output r1 as u64.public;\n")
    p = led.vm.execute(alice, "credits.aleo", "transfer_public",
                       [_addr(bob), "250u64"],
                       [("public", "address"), ("public", "u64")])
    b1 = led.prepare_advance_to_next_beacon_block([p])
    led.advance_to_next_block(b1)
    b2 = led.prepare_advance_to_next_beacon_block([])
    led.advance_to_next_block(b2)

    height = led.latest_height
    root = led.latest_state_root
    hash2 = led.latest_block.hash()
    committee = dict(led.committee.members)
    serials = set(led.spent_serial_numbers)
    bal_bob = led.get_public_balance(_addr(bob)) \
        if hasattr(led, "get_public_balance") else None

    # resume in a fresh Ledger instance from the same store
    led2 = Ledger.load(ks, random.Random(1), store_path=path, srs=None)
    assert led2.latest_height == height == 2
    assert led2.latest_state_root == root
    assert led2.latest_block.hash() == hash2
    assert dict(led2.committee.members) == committee
    assert set(led2.spent_serial_numbers) == serials
    # finalize state (public balances) came from the store, not re-seeded
    from snarkvm_tpu.synthesizer import finalize as F
    acct = led2.vm.store.mapping("credits.aleo", "account")
    assert len(acct.confirmed) >= 1
    if bal_bob is not None:
        assert led2.get_public_balance(_addr(bob)) == bal_bob

    # the resumed ledger keeps working: build + accept another block
    b3 = led2.prepare_advance_to_next_beacon_block([])
    led2.advance_to_next_block(b3)
    assert led2.latest_height == 3


def test_resume_rejects_mismatched_genesis(tmp_path, keys):
    ks, rng = keys
    path = str(tmp_path / "ledger.db")
    Ledger(ks, rng, store_path=path, srs=None)
    other = [PrivateKey.from_seed(i + 50) for i in range(3)]
    with pytest.raises(ValueError, match="genesis"):
        Ledger.load(other, random.Random(2), store_path=path, srs=None)
