"""PowersOfG lazy shard machinery (VERDICT item 8): checksum-verified
shard loading against the REAL mainnet artifacts, delta-shard range
extension with self-generated shards, fetcher hook + cache, and precise
shard-missing errors (parameters/src/mainnet/powers.rs:63,109 +
parameters/src/macros.rs:153-215).
"""
import hashlib
import json
import os

import pytest

from snarkvm_tpu.params.powers import (PowersOfG, ShardMissing,
                                       MAX_NUM_POWERS)
from snarkvm_tpu.formats import canonical

REF_RES = "/root/reference/parameters/src/mainnet/resources"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_RES),
                                reason="mainnet resources unavailable")


def test_real_base_shard_checksum_and_slice():
    p = PowersOfG([REF_RES])
    p.ensure_powers(1 << 15)
    pts = p[0:4]
    from snarkvm_tpu.params.mainnet_artifacts import MainnetSRS
    srs = MainnetSRS()
    assert pts == srs.powers_of_beta_g[0:4]
    assert p[100] == srs.powers_of_beta_g[100]


def test_real_missing_delta_shard_errors():
    p = PowersOfG([REF_RES])
    with pytest.raises(ShardMissing, match="powers-of-beta-16"):
        p.ensure_powers(1 << 16)


def test_checksum_mismatch_detected(tmp_path):
    raw = open(os.path.join(REF_RES, "powers-of-beta-15.usrs"), "rb").read()
    (tmp_path / "powers-of-beta-15.usrs").write_bytes(raw)
    (tmp_path / "powers-of-beta-15.metadata").write_text(json.dumps(
        {"checksum": "00" * 32, "size": len(raw)}))
    p = PowersOfG([str(tmp_path)])
    with pytest.raises(ValueError, match="checksum mismatch"):
        p.ensure_powers(1 << 15)


def _write_shard(dirpath, name, points):
    data = len(points).to_bytes(4, "little") + b"".join(
        canonical.write_g1_uncompressed(pt) for pt in points)
    with open(os.path.join(dirpath, f"{name}.usrs"), "wb") as f:
        f.write(data)
    meta = {"checksum": hashlib.sha256(data).hexdigest(), "size": len(data)}
    with open(os.path.join(dirpath, f"{name}.metadata"), "w") as f:
        json.dump(meta, f)
    return data


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    """A 2^13-power test SRS split into a base shard + two delta shards
    (scaled-down analog of the 2^15 base + doubling deltas)."""
    from snarkvm_tpu.polycommit import kzg
    import snarkvm_tpu.params.powers as powers_mod
    d = tmp_path_factory.mktemp("shards")
    srs = kzg.test_srs(1 << 13)
    pts = [srs.powers_of_beta_g[i] for i in range(1 << 13)]
    _write_shard(str(d), "powers-of-beta-15", pts[: 1 << 11])
    _write_shard(str(d), "powers-of-beta-16", pts[1 << 11: 1 << 12])
    delta17 = _write_shard(str(d), "powers-of-beta-17", pts[1 << 12: 1 << 13])
    return str(d), pts, delta17


def test_delta_extension(shard_dir, monkeypatch):
    import snarkvm_tpu.params.powers as pm
    d, pts, _ = shard_dir
    monkeypatch.setattr(pm, "BASE_LOG2", 15)
    p = PowersOfG([d])
    p.ensure_powers(1 << 11)
    assert p[0: 1 << 11] == pts[: 1 << 11]
    # extension pulls the delta shards on demand
    p.ensure_powers(1 << 12)
    assert p[(1 << 11) + 3] == pts[(1 << 11) + 3]
    p.ensure_powers(3 << 11)       # partially into shard 17
    assert p[0: 3 << 11] == pts[: 3 << 11]


def test_fetcher_hook_and_cache(shard_dir, tmp_path):
    d, pts, delta17 = shard_dir
    # local dir missing shard 17 — the fetcher supplies it
    import shutil
    local = tmp_path / "local"
    local.mkdir()
    for f in os.listdir(d):
        if "17" not in f:
            shutil.copy(os.path.join(d, f), local / f)
    cache = tmp_path / "cache"
    calls = []

    def fetch(name):
        calls.append(name)
        assert name == "powers-of-beta-17"
        return delta17

    p = PowersOfG([str(local)], cache_dir=str(cache), fetcher=fetch)
    p.ensure_powers(1 << 13)
    assert p[0: 1 << 13] == pts
    assert calls == ["powers-of-beta-17"]
    # fetched shard was cached; a fresh loader finds it without the hook
    p2 = PowersOfG([str(local)], cache_dir=str(cache))
    p2.ensure_powers(1 << 13)
    assert p2[(1 << 12) + 1] == pts[(1 << 12) + 1]
