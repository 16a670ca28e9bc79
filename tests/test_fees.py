"""Fee transitions (vm/execute.rs execute_fee + vm/verify.rs check_fee):
credits.aleo/fee_public attached to execute transactions, charged through
finalize, validated against the cost model."""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.console.types import literal_from_str, Plaintext
from snarkvm_tpu.synthesizer.vm import VM
from snarkvm_tpu.synthesizer.finalize import _key_of
from snarkvm_tpu.utils.encoding import bech32m_encode

rng = random.Random(77)


def _addr(pk):
    return bech32m_encode("aleo", pk.to_address()[0].to_bytes(32, "little"))


@pytest.fixture()
def funded_vm():
    vm = VM(rng)
    pk = account.PrivateKey.new(rng)
    vm.store.mapping("credits.aleo", "account").insert(
        _key_of(literal_from_str(_addr(pk))), Plaintext.literal("u64", 10_000_000))
    return vm, pk


class TestFeeTransitions:
    def test_fee_attached_and_charged(self, funded_vm):
        vm, pk = funded_vm
        dest = _addr(account.PrivateKey.new(rng))
        p = vm.execute(pk, "credits.aleo", "transfer_public", [dest, "100u64"],
                       [("public", "address"), ("public", "u64")], priority_fee=0)
        names = [(t.program_id, t.function_name) for t in p.transaction.transitions]
        assert names[-1] == ("credits.aleo", "fee_public")
        assert p.transaction.fee_amount >= 49_640  # finalize + storage
        vm.check_transaction(p)
        block = vm.advance_to_next_block([p])
        assert len(block.transactions) == 1
        bal = vm.store.mapping("credits.aleo", "account").get_confirmed(
            _key_of(literal_from_str(_addr(pk))))
        assert bal.value.value == 10_000_000 - 100 - p.transaction.fee_amount

    def test_underpaid_fee_rejected(self, funded_vm):
        vm, pk = funded_vm
        dest = _addr(account.PrivateKey.new(rng))
        p = vm.execute(pk, "credits.aleo", "transfer_public", [dest, "1u64"],
                       [("public", "address"), ("public", "u64")], priority_fee=0)
        p.transaction.fee_amount = 1
        with pytest.raises(ValueError, match="below required"):
            vm.check_transaction(p)

    def test_missing_fee_flagged(self, funded_vm):
        vm, pk = funded_vm
        dest = _addr(account.PrivateKey.new(rng))
        p = vm.execute(pk, "credits.aleo", "transfer_public", [dest, "1u64"],
                       [("public", "address"), ("public", "u64")])  # feeless
        with pytest.raises(ValueError, match="missing a fee"):
            vm.check_transaction(p)

    def test_unfunded_signer_aborts_in_speculation(self, funded_vm):
        vm, _ = funded_vm
        poor = account.PrivateKey.new(rng)
        dest = _addr(account.PrivateKey.new(rng))
        p = vm.execute(poor, "credits.aleo", "transfer_public", [dest, "1u64"],
                       [("public", "address"), ("public", "u64")], priority_fee=0)
        block = vm.advance_to_next_block([p])
        assert block.transactions == []
        assert len(block.aborted_transaction_ids) == 1

    def test_priority_fee_paid(self, funded_vm):
        vm, pk = funded_vm
        dest = _addr(account.PrivateKey.new(rng))
        p = vm.execute(pk, "credits.aleo", "transfer_public", [dest, "100u64"],
                       [("public", "address"), ("public", "u64")],
                       priority_fee=1_000)
        vm.advance_to_next_block([p])
        bal = vm.store.mapping("credits.aleo", "account").get_confirmed(
            _key_of(literal_from_str(_addr(pk))))
        assert bal.value.value == 10_000_000 - 100 - p.transaction.fee_amount - 1_000


class TestVerificationCache:
    def test_partially_verified_lru(self, funded_vm):
        vm, pk = funded_vm
        dest = _addr(account.PrivateKey.new(rng))
        p = vm.execute(pk, "credits.aleo", "transfer_public", [dest, "100u64"],
                       [("public", "address"), ("public", "u64")], priority_fee=0)
        vm.check_transaction(p)
        txid = p.transaction.id()
        assert txid in vm._partially_verified
        # a second check (block re-validation) hits the cache: even if the
        # fee field is now wrong, the heavy checks are skipped
        p.transaction.fee_amount = 0
        vm.check_transaction(p)
        # but restrictions are still height-gated and always re-checked
        from snarkvm_tpu.synthesizer.restrictions import Restrictions, BlockRange
        vm.restrictions = Restrictions(
            {}, {("credits.aleo", "transfer_public"): BlockRange("full")}, {})
        with pytest.raises(ValueError, match="restricted"):
            vm.check_transaction(p)

    def test_spend_limit_enforced(self, funded_vm):
        vm, pk = funded_vm
        dest = _addr(account.PrivateKey.new(rng))
        p = vm.execute(pk, "credits.aleo", "transfer_public", [dest, "100u64"],
                       [("public", "address"), ("public", "u64")], priority_fee=0)
        vm.TRANSACTION_SPEND_LIMIT = 10     # force the limit below the cost
        try:
            with pytest.raises(ValueError, match="spend limit"):
                vm.check_transaction(p)
        finally:
            del vm.TRANSACTION_SPEND_LIMIT
