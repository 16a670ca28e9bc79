"""Per-block JSON snapshots of the five staking mappings — the TPU build's
analog of the `history` feature (reference: synthesizer/src/vm/helpers/
history.rs: `History`, `MappingName`, group-sharded block directories).

Layout on disk (history.rs block_path/group):
    <root>/group-<height // 65535>/block-<height>/block-<height>-<mapping>.json
"""
from __future__ import annotations

import json
import os
from pathlib import Path

MAPPING_NAMES = ("bonded", "delegated", "metadata", "unbonding", "withdraw")


def history_directory_path(network: int, base_dir: str | None = None,
                           dev_id: int | None = None) -> Path:
    """history.rs history_directory_path — `.history-<net>-<id>` in
    development mode, `history-<net>` otherwise."""
    base = Path(base_dir or os.path.expanduser("~/.aleo"))
    if dev_id is not None:
        return base / f".history-{network}-{dev_id}"
    return base / f"history-{network}"


class History:
    def __init__(self, network: int = 0, base_dir: str | None = None,
                 dev_id: int | None = None):
        self.path = history_directory_path(network, base_dir, dev_id)

    @staticmethod
    def _group(height: int) -> int:
        return height // 0xFFFF                     # history.rs group()

    def _block_path(self, height: int) -> Path:
        return self.path / f"group-{self._group(height)}" / f"block-{height}"

    def store_mapping(self, height: int, mapping: str, data) -> None:
        assert mapping in MAPPING_NAMES, mapping
        p = self._block_path(height)
        p.mkdir(parents=True, exist_ok=True)
        (p / f"block-{height}-{mapping}.json").write_text(
            json.dumps(data, indent=2, default=str))

    def load_mapping(self, height: int, mapping: str) -> str:
        p = self._block_path(height) / f"block-{height}-{mapping}.json"
        return p.read_text()

    def store_block_mappings(self, height: int, store) -> None:
        """Dump the five credits.aleo staking mappings from a finalize
        store at this height (vm/finalize.rs history hook ~:1275).
        Keys are the store's canonical key encodings (hex), values the
        console value display strings."""
        from ..synthesizer.process import value_to_str
        for name in MAPPING_NAMES:
            mapping = store.mapping("credits.aleo", name)
            data = {}
            for k, v in getattr(mapping, "confirmed", {}).items():
                key = k.hex() if isinstance(k, (bytes, bytearray)) else str(k)
                try:
                    data[key] = value_to_str(v)
                except Exception:
                    data[key] = str(v)
            self.store_mapping(height, name, data)
