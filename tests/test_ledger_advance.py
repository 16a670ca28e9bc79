"""Ledger: genesis -> template -> check_next_block -> advance
(ledger/src/advance.rs + check_next_block.rs behavioral coverage)."""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.ledger.ledger import Ledger, Ratify, MAX_SOLUTIONS
from snarkvm_tpu.ledger import target as T
from snarkvm_tpu.utils.encoding import bech32m_encode

rng = random.Random(2024)


def _addr_str(pt):
    return bech32m_encode("aleo", pt[0].to_bytes(32, "little"))


@pytest.fixture(scope="module")
def ledger():
    keys = [account.PrivateKey.new(rng) for _ in range(4)]
    funded = _addr_str(keys[0].to_address())
    led = Ledger(keys, rng, public_balances={funded: 1_000_000_000}, srs=None)
    led._keys = keys
    led._funded = funded
    return led


class TestGenesis:
    def test_genesis_block(self, ledger):
        g = ledger.get_block(0)
        assert g.header.metadata.height == 0 and g.header.metadata.round == 0
        assert g.header.metadata.coinbase_target == T.GENESIS_COINBASE_TARGET
        assert g.header.metadata.proof_target == T.GENESIS_PROOF_TARGET
        assert ledger.latest_height == 0
        assert ledger.get_balance(ledger._funded) == 1_000_000_000
        assert ledger.committee.total_stake == 4 * 10_000_000_000_000

    def test_state_root_nonzero(self, ledger):
        assert ledger.latest_state_root != 0


class TestAdvance:
    def test_empty_block_advance(self, ledger):
        block = ledger.prepare_advance_to_next_beacon_block([])
        md = block.header.metadata
        assert md.height == 1 and md.round == 1
        # no solutions -> no combined target; targets still retarget on time
        assert md.cumulative_proof_target == 0
        ledger.advance_to_next_block(block)
        assert ledger.latest_height == 1
        assert ledger.latest_block.hash() == block.hash()

    def test_transaction_block(self, ledger):
        alice = ledger._keys[0]
        bob_addr = _addr_str(account.PrivateKey.new(rng).to_address())
        pending = ledger.vm.execute(
            alice, "credits.aleo", "transfer_public",
            [bob_addr, "250u64"], [("public", "address"), ("public", "u64")])
        before = ledger.get_balance(ledger._funded)
        block = ledger.prepare_advance_to_next_beacon_block([pending])
        assert len(block.transactions) == 1
        ledger.advance_to_next_block(block, [pending])
        assert ledger.get_balance(bob_addr) == 250
        assert ledger.get_balance(ledger._funded) == before - 250

    def test_rejected_transaction_aborts(self, ledger):
        poor = account.PrivateKey.new(rng)
        dest = _addr_str(account.PrivateKey.new(rng).to_address())
        pending = ledger.vm.execute(
            poor, "credits.aleo", "transfer_public",
            [dest, "999999u64"], [("public", "address"), ("public", "u64")])
        block = ledger.prepare_advance_to_next_beacon_block([pending])
        assert block.transactions == []
        assert len(block.aborted_transaction_ids) == 1
        ledger.advance_to_next_block(block, [pending])
        assert ledger.get_balance(dest) is None


class TestCheckNextBlock:
    def test_tampered_blocks_rejected(self, ledger):
        block = ledger.prepare_advance_to_next_beacon_block([])
        # previous hash tamper
        bad = ledger.prepare_advance_to_next_beacon_block([])
        bad.previous_hash = 12345
        with pytest.raises(ValueError, match="previous block hash"):
            ledger.check_next_block(bad)
        # height tamper
        bad2 = ledger.prepare_advance_to_next_beacon_block([])
        bad2.header.metadata.height += 1
        with pytest.raises(ValueError, match="height"):
            ledger.check_next_block(bad2)
        # timestamp must advance
        bad3 = ledger.prepare_advance_to_next_beacon_block(
            [], timestamp=ledger.latest_block.header.metadata.timestamp)
        with pytest.raises(ValueError, match="timestamp"):
            ledger.check_next_block(bad3)
        # target tamper
        bad4 = ledger.prepare_advance_to_next_beacon_block([])
        bad4.header.metadata.proof_target += 1
        with pytest.raises(ValueError, match="target"):
            ledger.check_next_block(bad4)
        # ratification tamper
        bad5 = ledger.prepare_advance_to_next_beacon_block([])
        bad5.ratifications = [Ratify("block_reward", 1), Ratify("puzzle_reward", 1)]
        with pytest.raises(ValueError, match="ratifications"):
            ledger.check_next_block(bad5)
        # the untampered block still advances
        ledger.advance_to_next_block(block)


class TestSolutionsAndRewards:
    def test_block_with_solution_pays_prover(self, ledger):
        prover = account.PrivateKey.new(rng).to_address()
        prover_str = _addr_str(prover)
        epoch_hash = ledger.latest_epoch_hash()
        sol = ledger.puzzle.prove(epoch_hash, prover[0], counter=11)
        # genesis proof target is astronomically high; ledgers under test
        # accept only if target clears it — force a tiny proof target
        ledger.latest_block.header.metadata.proof_target = 0
        block = ledger.prepare_advance_to_next_beacon_block([], [sol])
        assert len(block.solutions) == 1
        assert block.header.solutions_root != 0
        md = block.header.metadata
        assert md.cumulative_weight == sol.target
        ledger.advance_to_next_block(block)
        # exact reward accounting: the puzzle-reward ratification amount,
        # distributed pro-rata (may round to 0 for tiny targets)
        from snarkvm_tpu.ledger import rewards as RW
        puzzle_ratify = [r for r in block.ratifications
                         if r.kind == "puzzle_reward"][0]
        expected = RW.proving_rewards([(prover[0], sol.target)],
                                      puzzle_ratify.amount)
        bal = ledger.get_balance(prover_str)
        assert bal == expected.get(prover[0], None) or (
            bal is None and prover[0] not in expected)

    def test_staking_rewards_grow_committee_stake(self, ledger):
        assert ledger.committee.total_stake > 4 * 10_000_000_000_000


class TestAccessors:
    """ledger/src/{get,find,contains,iterators}.rs accessor surface."""

    def test_get_find_contains_iterators(self, ledger):
        b1 = ledger.get_block(1)
        assert ledger.get_block_by_hash(b1.hash()) is b1
        assert ledger.find_block_height_from_hash(b1.hash()) == 1
        assert ledger.contains_block_hash(b1.hash())
        assert ledger.contains_block_height(1)
        assert not ledger.contains_block_height(10**6)
        assert ledger.contains_state_root(ledger.latest_state_root)
        assert ledger.contains_program_id("credits.aleo")
        assert "credits.aleo" in list(ledger.program_ids())
        assert ledger.get_program("credits.aleo").id == "credits.aleo"
        # transactions recorded earlier in this module's block tests
        txids = list(ledger.transaction_ids())
        if txids:
            tx = ledger.get_transaction(txids[0])
            assert tx.id() == txids[0]
            tid = tx.transitions[0].id()
            assert ledger.get_transition(tid).id() == tid
            assert ledger.find_transaction_id_from_transition_id(tid) == txids[0]
        import pytest as _pt
        with _pt.raises(KeyError):
            ledger.get_block_by_hash(123456789)
        with _pt.raises(KeyError):
            ledger.get_transaction(987654321)
