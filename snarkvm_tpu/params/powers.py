"""PowersOfG — lazy, shard-backed universal-SRS powers with on-demand
range extension and checksum verification.

Mirrors parameters/src/mainnet/powers.rs:63 (PowersOfBetaG: base 2^15
shard + delta shards doubling to MAX_NUM_POWERS = 2^28, loaded only when
a requested range needs them) and parameters/src/macros.rs:153-215
(sha256 checksum against the .metadata manifest, local cache directory,
remote fetch). Remote fetch is a pluggable hook (`fetcher`) — offline
deployments (this build environment has zero egress) get a precise
"shard missing" error instead of a stub download.

Shard dialect (identical to the shipped artifacts):
  powers-of-beta-15.usrs          -> global powers [0, 2^15)
  powers-of-beta-K.usrs (16..28)  -> DELTA [2^(K-1), 2^K)
  shifted-powers-of-beta-K.usrs   -> suffix windows ending at 2^28
  <name>.metadata                 -> {"checksum": sha256hex, "size": n}
"""
from __future__ import annotations

import hashlib
import json
import os

from ..formats import canonical

MAX_NUM_POWERS_LOG2 = 28
MAX_NUM_POWERS = 1 << MAX_NUM_POWERS_LOG2
BASE_LOG2 = 15


class ShardMissing(RuntimeError):
    def __init__(self, filename):
        super().__init__(
            f"SRS shard {filename!r} is not available locally and no "
            f"fetcher is configured (parameters/src/macros.rs:171 "
            f"downloads it from https://parameters.aleo.org)")
        self.filename = filename


def _sha256(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _parse_powers(data: bytes):
    n32 = int.from_bytes(data[:4], "little")
    if 4 + n32 * 96 == len(data):
        count, off = n32, 4
    else:
        count = int.from_bytes(data[:8], "little")
        off = 8
    return [canonical.read_g1_uncompressed(data[off + 96 * i:
                                                off + 96 * (i + 1)])
            for i in range(count)]


class PowersOfG:
    """Sliceable global G1 power table assembled lazily from shards.

    `dirs` are searched in order for `<name>.usrs`; `cache_dir` receives
    fetched shards; `fetcher(name) -> bytes` is the remote hook. Loaded
    shards are checksum-verified against `<name>.metadata` when the
    manifest is present (macros.rs:160-166)."""

    def __init__(self, dirs, cache_dir: str | None = None, fetcher=None,
                 verify: bool = True):
        self.dirs = list(dirs)
        self.cache_dir = cache_dir
        self.fetcher = fetcher
        self.verify = verify
        self._loaded = {}           # name -> [points]
        self._fwd = []              # cumulative forward windows (start, pts)
        self._fwd_end = 0
        self._next_k = BASE_LOG2 + 1

    # -- shard plumbing ----------------------------------------------------
    def _find(self, name: str):
        for d in self.dirs + ([self.cache_dir] if self.cache_dir else []):
            p = os.path.join(d, f"{name}.usrs")
            if os.path.exists(p):
                return p
        return None

    def _metadata(self, name: str):
        for d in self.dirs + ([self.cache_dir] if self.cache_dir else []):
            p = os.path.join(d, f"{name}.metadata")
            if os.path.exists(p):
                with open(p) as f:
                    return json.load(f)
        return None

    def _load_shard(self, name: str):
        if name in self._loaded:
            return self._loaded[name]
        path = self._find(name)
        if path is not None:
            with open(path, "rb") as f:
                data = f.read()
        elif self.fetcher is not None:
            data = self.fetcher(name)
            if self.cache_dir:
                os.makedirs(self.cache_dir, exist_ok=True)
                with open(os.path.join(self.cache_dir, f"{name}.usrs"),
                          "wb") as f:
                    f.write(data)
        else:
            raise ShardMissing(name)
        if self.verify:
            meta = self._metadata(name)
            if meta is not None:
                if len(data) != meta.get("size", len(data)):
                    raise ValueError(f"shard {name}: size mismatch "
                                     f"({len(data)} != {meta['size']})")
                got = _sha256(data)
                if got != meta["checksum"]:
                    raise ValueError(f"shard {name}: checksum mismatch "
                                     f"({got} != {meta['checksum']})")
        pts = _parse_powers(data)
        self._loaded[name] = pts
        return pts

    # -- range assembly ----------------------------------------------------
    def ensure_powers(self, stop: int):
        """Extend coverage so global powers [0, stop) are resident
        (download_powers_for analog, powers.rs:109). Delta shards are
        appended cumulatively: the base shard covers [0, len) and delta
        shard K covers the next len(K) indices — with the real artifacts
        that is exactly [2^(K-1), 2^K)."""
        if stop > MAX_NUM_POWERS:
            raise ValueError(f"requested {stop} > MAX_NUM_POWERS")
        if not self._fwd:
            pts = self._load_shard(f"powers-of-beta-{BASE_LOG2}")
            self._fwd.append((0, pts))
            self._fwd_end = len(pts)
            self._next_k = BASE_LOG2 + 1
        while self._fwd_end < stop and self._next_k <= MAX_NUM_POWERS_LOG2:
            pts = self._load_shard(f"powers-of-beta-{self._next_k}")
            self._fwd.append((self._fwd_end, pts))
            self._fwd_end += len(pts)
            self._next_k += 1
        if self._fwd_end < stop:
            raise ShardMissing(f"powers covering index {self._fwd_end}")

    def ensure_shifted(self, lo: int):
        """Ensure shifted powers covering [lo, MAX_NUM_POWERS): shifted
        shard 15 is the innermost suffix window; each shard K extends
        the coverage downward (powers.rs shifted layout)."""
        k = BASE_LOG2
        while k <= MAX_NUM_POWERS_LOG2:
            self._load_shard(f"shifted-powers-of-beta-{k}")
            start, _ = self._shifted_windows()[-1]
            if start <= lo:
                return
            k += 1
        raise ShardMissing(f"shifted powers covering index {lo}")

    def _shifted_windows(self):
        """Loaded shifted windows as (start, pts), descending from the
        top: shard 15 ends at MAX_NUM_POWERS, each next shard sits
        directly below."""
        windows = []
        pos = MAX_NUM_POWERS
        for k in range(BASE_LOG2, MAX_NUM_POWERS_LOG2 + 1):
            name = f"shifted-powers-of-beta-{k}"
            if name not in self._loaded:
                break
            pts = self._loaded[name]
            windows.append((pos - len(pts), pts))
            pos -= len(pts)
        return windows

    # -- access ------------------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, slice):
            lo, hi = key.start or 0, key.stop
            return self._range(lo, hi)
        return self._range(key, key + 1)[0]

    def _range(self, lo: int, hi: int):
        if not (0 <= lo <= hi <= MAX_NUM_POWERS):
            raise IndexError(f"power range [{lo}, {hi}) out of bounds")
        if hi <= self._fwd_end:
            return self._gather(lo, hi, self._fwd)
        return self._gather(lo, hi, self._shifted_windows())

    def _gather(self, lo, hi, windows):
        out = []
        i = lo
        while i < hi:
            for start, pts in windows:
                if start <= i < start + len(pts):
                    take = min(hi, start + len(pts)) - i
                    out.extend(pts[i - start: i - start + take])
                    i += take
                    break
            else:
                raise ShardMissing(f"powers covering index {i}")
        return out
