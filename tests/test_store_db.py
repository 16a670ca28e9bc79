"""Persistent SQLite store backend (ledger/store_db.py): NestedMap trait
parity with the in-memory backend, atomic flush, crash durability, and a
Ledger running on it end-to-end with state surviving reopen."""
import random

import pytest

from snarkvm_tpu.ledger.store import NestedMap
from snarkvm_tpu.ledger.store_db import DbNestedMap


def _exercise(maps):
    m = maps.map(("prog.aleo", "account"))
    m.insert(b"alice", 100)
    maps.start_atomic()
    maps.atomic_checkpoint()
    m.insert(b"bob", 50)
    m.remove(b"alice")
    assert m.get_speculative(b"bob") == 50
    assert m.get_speculative(b"alice") is None
    assert m.get_confirmed(b"alice") == 100       # not yet flushed
    maps.atomic_rewind()                           # drop tx 1
    maps.atomic_checkpoint()
    m.insert(b"carol", 7)
    maps.clear_latest_checkpoint()
    maps.finish_atomic()
    return (m.get_confirmed(b"alice"), m.get_confirmed(b"bob"),
            m.get_confirmed(b"carol"), len(m))


class TestTraitParity:
    def test_same_behavior_as_memory(self, tmp_path):
        mem = _exercise(NestedMap())
        db = _exercise(DbNestedMap(str(tmp_path / "s.db")))
        assert db == mem == (100, None, 7, 2)

    def test_mid_batch_map_creation(self, tmp_path):
        maps = DbNestedMap(str(tmp_path / "s.db"))
        maps.start_atomic()
        maps.atomic_checkpoint()
        m = maps.map(("p.aleo", "late"))           # created mid-batch
        m.insert(b"k", 1)
        maps.atomic_rewind()
        maps.finish_atomic()
        assert m.get_confirmed(b"k") is None

    def test_abort_discards(self, tmp_path):
        maps = DbNestedMap(str(tmp_path / "s.db"))
        m = maps.map(("p.aleo", "m"))
        maps.start_atomic()
        m.insert(b"x", 9)
        maps.abort_atomic()
        assert m.get_confirmed(b"x") is None


class TestDurability:
    def test_reopen_preserves_confirmed(self, tmp_path):
        path = str(tmp_path / "chain.db")
        maps = DbNestedMap(path)
        m = maps.map(("credits.aleo", "account"))
        m.insert(b"addr", {"balance": 12345})
        maps.close()
        maps2 = DbNestedMap(path)
        assert maps2.map(("credits.aleo", "account")).get_confirmed(b"addr") == {"balance": 12345}


class TestLedgerOnDb:
    def test_chain_survives_reopen(self, tmp_path):
        from snarkvm_tpu.console import account
        from snarkvm_tpu.ledger.ledger import Ledger
        from snarkvm_tpu.utils.encoding import bech32m_encode

        rng = random.Random(11)
        path = str(tmp_path / "ledger.db")
        keys = [account.PrivateKey.new(rng) for _ in range(4)]
        funded = bech32m_encode("aleo", keys[0].to_address()[0].to_bytes(32, "little"))
        led = Ledger(keys, rng, public_balances={funded: 1_000_000},
                     store_path=path, srs=None)
        dest = bech32m_encode("aleo", account.PrivateKey.new(rng).to_address()[0].to_bytes(32, "little"))
        p = led.vm.execute(keys[0], "credits.aleo", "transfer_public",
                           [dest, "77u64"], [("public", "address"), ("public", "u64")])
        block = led.prepare_advance_to_next_beacon_block([p])
        led.advance_to_next_block(block, [p])
        assert led.get_balance(dest) == 77
        led.vm.store.maps.close()

        # reopen the database cold: the balances are still there
        from snarkvm_tpu.ledger.store_db import DbNestedMap
        from snarkvm_tpu.synthesizer.finalize import _key_of
        from snarkvm_tpu.console.types import literal_from_str
        maps = DbNestedMap(path)
        v = maps.map(("credits.aleo", "account")).get_confirmed(
            _key_of(literal_from_str(dest)))
        assert v is not None and v.value.value == 77


def test_mapid_catalog_and_family(tmp_path):
    """The rocksdb keyspace catalog (internal/id.rs MapID families)."""
    from snarkvm_tpu.ledger.store_db import MAP_ID, DbNestedMap

    # full family inventory present with unique u16 prefixes
    assert len(MAP_ID) == len(set(MAP_ID.values()))
    for key in ("BFT::Transmissions", "Block::StateRoot",
                "Block::RejectedDeploymentOrExecution",
                "Committee::CurrentRound", "Deployment::Owner",
                "Execution::Inclusion", "Fee::ReverseFee",
                "TransitionInput::RecordTag", "TransitionOutput::Future",
                "Transaction::ID", "Transition::SCM", "Program::KeyValueID"):
        assert key in MAP_ID
    db = DbNestedMap(str(tmp_path / "kv.db"))
    m = db.family("Transition::TPK")
    db.start_atomic()
    m.insert(b"k", 123)
    db.finish_atomic()
    assert db.family("Transition::TPK").get_confirmed(b"k") == 123
    assert db.family("Transition::TCM").get_confirmed(b"k") is None
