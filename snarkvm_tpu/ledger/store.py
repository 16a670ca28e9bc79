"""Storage layer: atomic key-value maps (ledger/store/src/helpers/).

Mirrors the Map/MapRead + NestedMap trait surface with atomic batch
semantics — start_atomic / atomic_checkpoint / atomic_rewind /
abort_atomic / finish_atomic (traits/map.rs:22-58) — the rollback
machinery speculation relies on. In-memory backend; a RocksDB-style
file backend can implement the same interface.
"""
from __future__ import annotations


class AtomicMap:
    """Map with confirmed state + atomic batch overlay and checkpoints."""

    _TOMBSTONE = object()

    def __init__(self):
        self.confirmed = {}
        self.batch = None          # list of (key, value|TOMBSTONE) ops when atomic
        self.checkpoints = []

    # -- atomic control --
    def start_atomic(self):
        assert self.batch is None, "atomic batch already in progress"
        self.batch = []
        self.checkpoints = []

    def is_atomic_in_progress(self) -> bool:
        return self.batch is not None

    def atomic_checkpoint(self):
        assert self.batch is not None
        self.checkpoints.append(len(self.batch))

    def atomic_rewind(self):
        assert self.batch is not None
        mark = self.checkpoints.pop() if self.checkpoints else 0
        del self.batch[mark:]

    def clear_latest_checkpoint(self):
        if self.checkpoints:
            self.checkpoints.pop()

    def abort_atomic(self):
        self.batch = None
        self.checkpoints = []

    def finish_atomic(self):
        assert self.batch is not None
        for key, value in self.batch:
            if value is self._TOMBSTONE:
                self.confirmed.pop(key, None)
            else:
                self.confirmed[key] = value
        self.batch = None
        self.checkpoints = []

    # -- writes --
    def insert(self, key, value):
        if self.batch is not None:
            self.batch.append((key, value))
        else:
            self.confirmed[key] = value

    def remove(self, key):
        if self.batch is not None:
            self.batch.append((key, self._TOMBSTONE))
        else:
            self.confirmed.pop(key, None)

    # -- reads --
    def get_confirmed(self, key, default=None):
        return self.confirmed.get(key, default)

    def get_speculative(self, key, default=None):
        """Pending batch view layered over confirmed (FinalizeStore:712)."""
        if self.batch is not None:
            for k, v in reversed(self.batch):
                if k == key:
                    return default if v is self._TOMBSTONE else v
        return self.confirmed.get(key, default)

    def contains_confirmed(self, key) -> bool:
        return key in self.confirmed

    def contains_speculative(self, key) -> bool:
        sentinel = object()
        return self.get_speculative(key, sentinel) is not sentinel

    def keys_confirmed(self):
        return self.confirmed.keys()

    def __len__(self):
        return len(self.confirmed)


class NestedMap:
    """(map_id -> key -> value), e.g. program/mapping -> key (FinalizeStore).
    Maps created mid-batch join the batch at the current checkpoint depth."""

    def __init__(self):
        self.maps = {}
        self._atomic = False
        self._depth = 0

    def map(self, outer_key) -> AtomicMap:
        if outer_key not in self.maps:
            m = AtomicMap()
            if self._atomic:
                m.start_atomic()
                for _ in range(self._depth):
                    m.atomic_checkpoint()
            self.maps[outer_key] = m
        return self.maps[outer_key]

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
        for m in self.maps.values():
            m.finish_atomic()
