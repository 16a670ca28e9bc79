"""Persistent storage backend (ledger/store/src/helpers/rocksdb analog).

SQLite-backed NestedMap with the same trait surface as the in-memory
backend (store.py): confirmed state lives in one `kv` table keyed by
(map_id, key); atomic batches and checkpoints stay in memory exactly like
the reference's RocksDB WriteBatch — finish_atomic flushes the batch in
ONE SQL transaction, so a crash mid-finalize leaves the confirmed state
at the previous block (the property speculation relies on).

Values are pickled (internal storage format; the consensus-visible
serialization is the bit-level one in console/types.py).
"""
from __future__ import annotations

import os
import pickle
import sqlite3

from .store import AtomicMap


def _mapids():
    """The reference's full RocksDB keyspace catalog
    (ledger/store/src/helpers/rocksdb/internal/id.rs:20-210): u16-prefix
    map families. The SQLite backend uses these names as map_id prefixes
    so a datum lives under the same logical family as in the reference."""
    families = {
        "BFT": ["Transmissions", "AbortedTransmissionIDs"],
        "Block": ["StateRoot", "ReverseStateRoot", "ID", "ReverseID",
                  "Header", "Authority", "Certificate", "Ratifications",
                  "Solutions", "PuzzleCommitments", "AbortedSolutionIDs",
                  "AbortedSolutionHeights", "Transactions",
                  "AbortedTransactionIDs", "RejectedOrAbortedTransactionID",
                  "ConfirmedTransactions", "RejectedDeploymentOrExecution"],
        "Committee": ["CurrentRound", "RoundToHeight", "Committee"],
        "Deployment": ["ID", "Edition", "ReverseID", "Owner", "Program",
                       "VerifyingKey", "Certificate"],
        "Execution": ["ID", "ReverseID", "Inclusion"],
        "Fee": ["Fee", "ReverseFee"],
        "TransitionInput": ["ID", "ReverseID", "Constant", "Public",
                            "Private", "Record", "RecordTag", "ExternalRecord"],
        "TransitionOutput": ["ID", "ReverseID", "Constant", "Public",
                             "Private", "Record", "RecordNonce",
                             "ExternalRecord", "Future"],
        "Transaction": ["ID"],
        "Transition": ["Locator", "TPK", "ReverseTPK", "TCM", "ReverseTCM",
                       "SCM"],
        "Program": ["ProgramID", "KeyValueID"],
    }
    out = {}
    prefix = 0
    for fam, names in families.items():
        for name in names:
            out[f"{fam}::{name}"] = prefix
            prefix += 1
    return out


MAP_ID = _mapids()


class _SqlDict:
    """dict-like confirmed view over (map_id, key) rows."""

    def __init__(self, conn: sqlite3.Connection, map_id: bytes):
        self.conn = conn
        self.map_id = map_id

    def get(self, key, default=None):
        row = self.conn.execute(
            "SELECT value FROM kv WHERE map_id=? AND key=?",
            (self.map_id, key)).fetchone()
        return pickle.loads(row[0]) if row else default

    def __setitem__(self, key, value):
        self.conn.execute(
            "INSERT OR REPLACE INTO kv (map_id, key, value) VALUES (?,?,?)",
            (self.map_id, key, pickle.dumps(value)))

    def pop(self, key, default=None):
        v = self.get(key, default)
        self.conn.execute("DELETE FROM kv WHERE map_id=? AND key=?",
                          (self.map_id, key))
        return v

    def __contains__(self, key):
        return self.conn.execute(
            "SELECT 1 FROM kv WHERE map_id=? AND key=?",
            (self.map_id, key)).fetchone() is not None

    def keys(self):
        return [r[0] for r in self.conn.execute(
            "SELECT key FROM kv WHERE map_id=?", (self.map_id,))]

    def __len__(self):
        return self.conn.execute(
            "SELECT COUNT(*) FROM kv WHERE map_id=?",
            (self.map_id,)).fetchone()[0]


class DbAtomicMap(AtomicMap):
    """AtomicMap whose confirmed state is a SQLite table slice; batch and
    checkpoint machinery is inherited unchanged."""

    def __init__(self, conn: sqlite3.Connection, map_id: bytes, parent):
        super().__init__()
        self.confirmed = _SqlDict(conn, map_id)
        self._parent = parent

    def finish_atomic(self):
        assert self.batch is not None
        conn = self._parent.conn
        conn.execute("BEGIN")
        try:
            for key, value in self.batch:
                if value is self._TOMBSTONE:
                    self.confirmed.pop(key, None)
                else:
                    self.confirmed[key] = value
            conn.execute("COMMIT")
        except BaseException:
            conn.execute("ROLLBACK")
            raise
        self.batch = None
        self.checkpoints = []


class DbNestedMap:
    """NestedMap over SQLite (same interface as store.NestedMap)."""

    def __init__(self, path: str):
        first = not os.path.exists(path) or os.path.getsize(path) == 0
        # autocommit for direct (non-atomic) writes; finish_atomic uses an
        # explicit BEGIN/COMMIT so the batch lands as one transaction
        self.conn = sqlite3.connect(path, isolation_level=None)
        self.conn.execute("PRAGMA journal_mode=WAL")
        if first:
            self.conn.execute(
                "CREATE TABLE IF NOT EXISTS kv ("
                "map_id BLOB, key BLOB, value BLOB, "
                "PRIMARY KEY (map_id, key))")
            self.conn.commit()
        self.maps = {}
        self._atomic = False
        self._depth = 0
        self._in_txn = False

    @staticmethod
    def _map_id(outer_key) -> bytes:
        if isinstance(outer_key, bytes):
            return outer_key
        if isinstance(outer_key, tuple):
            return "\x1f".join(str(p) for p in outer_key).encode()
        return str(outer_key).encode()

    def family(self, name: str) -> DbAtomicMap:
        """Map addressed by the reference keyspace catalog, e.g.
        family("TransitionInput::Record") (rocksdb internal/id.rs MapID)."""
        prefix = MAP_ID[name]
        return self.map(("__mapid__", prefix, name))

    def map(self, outer_key) -> DbAtomicMap:
        mid = self._map_id(outer_key)
        if mid not in self.maps:
            m = DbAtomicMap(self.conn, mid, self)
            if self._atomic:
                m.start_atomic()
                for _ in range(self._depth):
                    m.atomic_checkpoint()
            self.maps[mid] = m
        return self.maps[mid]

    def start_atomic(self):
        self._atomic, self._depth = True, 0
        for m in self.maps.values():
            m.start_atomic()

    def atomic_checkpoint(self):
        self._depth += 1
        for m in self.maps.values():
            m.atomic_checkpoint()

    def atomic_rewind(self):
        self._depth = max(0, self._depth - 1)
        for m in self.maps.values():
            m.atomic_rewind()

    def clear_latest_checkpoint(self):
        self._depth = max(0, self._depth - 1)
        for m in self.maps.values():
            m.clear_latest_checkpoint()

    def abort_atomic(self):
        self._atomic, self._depth = False, 0
        for m in self.maps.values():
            m.abort_atomic()

    def finish_atomic(self):
        self._atomic, self._depth = False, 0
        self.conn.execute("BEGIN")
        try:
            for m in self.maps.values():
                # inline flush inside the shared transaction
                assert m.batch is not None
                for key, value in m.batch:
                    if value is AtomicMap._TOMBSTONE:
                        m.confirmed.pop(key, None)
                    else:
                        m.confirmed[key] = value
                m.batch = None
                m.checkpoints = []
            self.conn.execute("COMMIT")
        except BaseException:
            self.conn.execute("ROLLBACK")
            raise

    def close(self):
        self.conn.close()


class BlockStore:
    """Persistent block storage (ledger/store/src/block BlockStorage
    analog): height-keyed block blobs in the same SQLite file as the
    finalize store. The ledger IS the checkpoint (SURVEY §5.4) —
    Ledger.load restores from here."""

    def __init__(self, path: str):
        import sqlite3
        self.conn = sqlite3.connect(path)
        self.conn.execute(
            "CREATE TABLE IF NOT EXISTS blocks "
            "(height INTEGER PRIMARY KEY, data BLOB)")
        self.conn.execute(
            "CREATE TABLE IF NOT EXISTS block_meta (key TEXT PRIMARY KEY, value BLOB)")
        self.conn.commit()

    def put_meta(self, key: str, value: bytes) -> None:
        self.conn.execute(
            "INSERT OR REPLACE INTO block_meta (key, value) VALUES (?, ?)",
            (key, value))
        self.conn.commit()

    def get_meta(self, key: str):
        row = self.conn.execute(
            "SELECT value FROM block_meta WHERE key = ?", (key,)).fetchone()
        return row[0] if row else None

    def put_block(self, height: int, block) -> None:
        import pickle
        self.conn.execute(
            "INSERT OR REPLACE INTO blocks (height, data) VALUES (?, ?)",
            (height, pickle.dumps(block)))
        self.conn.commit()

    def get_block(self, height: int):
        import pickle
        row = self.conn.execute(
            "SELECT data FROM blocks WHERE height = ?", (height,)).fetchone()
        return pickle.loads(row[0]) if row else None

    def max_height(self) -> int | None:
        row = self.conn.execute("SELECT MAX(height) FROM blocks").fetchone()
        return row[0]

    def blocks(self):
        import pickle
        for _, data in self.conn.execute(
                "SELECT height, data FROM blocks ORDER BY height"):
            yield pickle.loads(data)


# ---------------------------------------------------------------------------
# StorageMode (aleo-std storage semantics; used by the reference's RocksDB
# backend at ledger/store/src/helpers/rocksdb/internal/mod.rs to pick the
# on-disk directory): Production -> the long-lived data dir, Development(id)
# -> a numbered dev dir, Custom(path) -> verbatim.
# ---------------------------------------------------------------------------

import os as _os


class StorageMode:
    """Resolves the ledger database directory."""

    def __init__(self, kind: str = "production", dev_id: int | None = None,
                 custom_path: str | None = None):
        assert kind in ("production", "development", "custom")
        if kind == "development":
            assert dev_id is not None
        if kind == "custom":
            assert custom_path is not None
        self.kind = kind
        self.dev_id = dev_id
        self.custom_path = custom_path

    @classmethod
    def production(cls) -> "StorageMode":
        return cls("production")

    @classmethod
    def development(cls, dev_id: int) -> "StorageMode":
        return cls("development", dev_id=dev_id)

    @classmethod
    def custom(cls, path: str) -> "StorageMode":
        return cls("custom", custom_path=path)

    def path(self, network_id: int = 0) -> str:
        base = _os.environ.get(
            "SNARKVM_TPU_DATA_DIR",
            _os.path.join(_os.path.expanduser("~"), ".snarkvm_tpu"))
        if self.kind == "production":
            return _os.path.join(base, f"ledger-{network_id}", "ledger.db")
        if self.kind == "development":
            return _os.path.join(base, f"ledger-{network_id}-dev-{self.dev_id}",
                                 "ledger.db")
        return self.custom_path

    def open(self, network_id: int = 0) -> "BlockStore":
        p = self.path(network_id)
        _os.makedirs(_os.path.dirname(p) or ".", exist_ok=True)
        return BlockStore(p)
