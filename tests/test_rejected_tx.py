"""Rejected vs aborted transactions (vm/finalize.rs atomic_speculate +
block/src/transactions/confirmed/mod.rs): a transaction whose body halts
in finalize but whose fee clears enters the block FEE-ONLY with the fee
charged (ConfirmedTransaction::RejectedExecute); a transaction that
cannot pay is aborted (excluded, listed in aborted_transaction_ids)."""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.console.types import literal_from_str, Plaintext
from snarkvm_tpu.synthesizer.vm import VM
from snarkvm_tpu.synthesizer.finalize import _key_of
from snarkvm_tpu.utils.encoding import bech32m_encode
from snarkvm_tpu.ledger.block import ConfirmedTransaction, fee_only_transaction

rng = random.Random(404)


def _addr(pk):
    return bech32m_encode("aleo", pk.to_address()[0].to_bytes(32, "little"))


def _balance(vm, pk):
    v = vm.store.mapping("credits.aleo", "account").get_confirmed(
        _key_of(literal_from_str(_addr(pk))))
    return v.value.value if v is not None else None


@pytest.fixture()
def vm_and_keys():
    vm = VM(rng)
    rich = account.PrivateKey.new(rng)
    vm.store.mapping("credits.aleo", "account").insert(
        _key_of(literal_from_str(_addr(rich))), Plaintext.literal("u64", 10_000_000))
    return vm, rich


def test_rejected_body_charges_fee_only(vm_and_keys):
    vm, rich = vm_and_keys
    dest = _addr(account.PrivateKey.new(rng))
    # transfer more than the balance: the transfer finalize halts, the
    # fee finalize succeeds -> rejected (fee-only) in the block
    p = vm.execute(rich, "credits.aleo", "transfer_public",
                   [dest, "999999999u64"],
                   [("public", "address"), ("public", "u64")], priority_fee=0)
    fee = p.transaction.fee_amount
    before = _balance(vm, rich)
    block = vm.advance_to_next_block([p])
    # block carries ONE fee-only transaction, no aborted ids
    assert len(block.transactions) == 1
    assert block.transactions[0].kind == "fee"
    assert [t.function_name for t in block.transactions[0].transitions] == ["fee_public"]
    assert block.aborted_transaction_ids == []
    # fee charged, transfer NOT applied
    assert _balance(vm, rich) == before - fee
    # the fee-only id differs from the unconfirmed id but is derivable
    assert block.transactions[0].id() == fee_only_transaction(p.transaction).id()
    assert block.transactions[0].id() != p.transaction.id()


def test_unpayable_body_is_aborted(vm_and_keys):
    vm, _ = vm_and_keys
    poor = account.PrivateKey.new(rng)   # zero balance: fee also halts
    dest = _addr(account.PrivateKey.new(rng))
    p = vm.execute(poor, "credits.aleo", "transfer_public",
                   [dest, "5u64"],
                   [("public", "address"), ("public", "u64")], priority_fee=0)
    block = vm.advance_to_next_block([p])
    assert block.transactions == []
    assert block.aborted_transaction_ids == [p.transaction.id()]


def test_feeless_halting_tx_is_aborted(vm_and_keys):
    vm, rich = vm_and_keys
    dest = _addr(account.PrivateKey.new(rng))
    p = vm.execute(rich, "credits.aleo", "transfer_public",
                   [dest, "999999999u64"],
                   [("public", "address"), ("public", "u64")])  # no fee
    block = vm.advance_to_next_block([p])
    assert block.transactions == []
    assert block.aborted_transaction_ids == [p.transaction.id()]


def test_confirmed_transaction_ids(vm_and_keys):
    vm, rich = vm_and_keys
    dest = _addr(account.PrivateKey.new(rng))
    ok = vm.execute(rich, "credits.aleo", "transfer_public", [dest, "10u64"],
                    [("public", "address"), ("public", "u64")], priority_fee=0)
    bad = vm.execute(rich, "credits.aleo", "transfer_public",
                     [dest, "999999999u64"],
                     [("public", "address"), ("public", "u64")], priority_fee=0)
    accepted, rejected, aborted = vm.speculate([ok, bad])
    vm.abort_speculation()
    assert accepted == [0] and rejected == [1] and aborted == []
    ct = ConfirmedTransaction("rejected_execute", 1,
                              fee_only_transaction(bad.transaction),
                              rejected=bad.transaction)
    assert not ct.is_accepted
    assert ct.to_unconfirmed_id() == bad.transaction.id()
    ok_ct = ConfirmedTransaction("accepted_execute", 0, ok.transaction)
    assert ok_ct.is_accepted
    assert ok_ct.to_unconfirmed_id() == ok.transaction.id()


def test_ledger_block_with_rejected_tx():
    """Full Ledger path: an accepted and a rejected tx in one block; the
    block template records ConfirmedTransaction variants, the rejected
    tx enters fee-only, and check_next_block re-speculation agrees."""
    from snarkvm_tpu.ledger.ledger import Ledger

    keys = [account.PrivateKey.new(rng) for _ in range(4)]
    funded = _addr(keys[0])
    led = Ledger(keys, rng, public_balances={funded: 1_000_000_000}, srs=None)
    alice = keys[0]
    bob = _addr(account.PrivateKey.new(rng))

    ok = led.vm.execute(alice, "credits.aleo", "transfer_public",
                        [bob, "100u64"],
                        [("public", "address"), ("public", "u64")],
                        priority_fee=0)
    bad = led.vm.execute(alice, "credits.aleo", "transfer_public",
                         [bob, "999999999999u64"],
                         [("public", "address"), ("public", "u64")],
                         priority_fee=0)
    block = led.prepare_advance_to_next_beacon_block([ok, bad])
    variants = [c.variant for c in block.confirmed]
    assert variants == ["accepted_execute", "rejected_execute"]
    assert block.transactions[1].kind == "fee"
    assert block.confirmed[1].to_unconfirmed_id() == bad.transaction.id()
    assert block.aborted_transaction_ids == []
    before = led.get_balance(funded)
    led.advance_to_next_block(block)
    # accepted transfer applied + BOTH fees charged
    total_fees = ok.transaction.fee_amount + bad.transaction.fee_amount
    assert led.get_balance(funded) == before - 100 - total_fees
