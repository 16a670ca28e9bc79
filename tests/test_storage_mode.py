"""StorageMode path resolution (aleo-std storage semantics,
rocksdb/internal/mod.rs dir selection)."""
import os
import tempfile

from snarkvm_tpu.ledger.store_db import StorageMode


def test_paths(monkeypatch, tmp_path):
    monkeypatch.setenv("SNARKVM_TPU_DATA_DIR", str(tmp_path))
    assert StorageMode.production().path(0).endswith("ledger-0/ledger.db")
    assert "dev-3" in StorageMode.development(3).path(1)
    assert StorageMode.custom("/x/y.db").path() == "/x/y.db"


def test_open_creates_store(monkeypatch, tmp_path):
    monkeypatch.setenv("SNARKVM_TPU_DATA_DIR", str(tmp_path))
    store = StorageMode.development(7).open(0)
    assert os.path.exists(StorageMode.development(7).path(0))
