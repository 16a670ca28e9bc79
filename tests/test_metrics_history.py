"""Metrics facade (metrics/src/lib.rs analog) and the per-block staking
history dumps (synthesizer/src/vm/helpers/history.rs analog)."""
import json

from snarkvm_tpu.utils import metrics
from snarkvm_tpu.ledger.history import History, history_directory_path


class TestMetrics:
    def setup_method(self):
        metrics.reset()

    def test_counter_gauge_histogram(self):
        metrics.register_metrics()
        metrics.increment_counter("txs")
        metrics.increment_counter("txs")
        metrics.counter("blocks", 5)
        metrics.gauge("height", 42)
        metrics.increment_gauge("height", 3)
        metrics.decrement_gauge("height", 1)
        metrics.histogram("prove_ms", 10.0)
        metrics.histogram("prove_ms", 30.0)
        snap = metrics.snapshot()
        assert snap["counters"]["txs"] == 2
        assert snap["counters"]["blocks"] == 5
        assert snap["gauges"]["height"] == 44
        assert snap["histograms"]["prove_ms"] == [10.0, 30.0]
        assert metrics.COMMITTEE_TOTAL_STAKE in snap["gauges"]

    def test_committee_sets_total_stake_gauge(self):
        from snarkvm_tpu.ledger.committee import Committee, MIN_VALIDATOR_STAKE
        members = {i: (MIN_VALIDATOR_STAKE, True, 0) for i in (1, 2, 3)}
        Committee(0, members)
        snap = metrics.snapshot()
        assert snap["gauges"][metrics.COMMITTEE_TOTAL_STAKE] == 3 * MIN_VALIDATOR_STAKE

    def test_prometheus_render(self):
        metrics.counter("a", 1)
        metrics.gauge("b", 2.5)
        text = metrics.render_prometheus()
        assert "a 1" in text and "b 2.5" in text


class TestHistory:
    def test_directory_layout(self, tmp_path):
        assert history_directory_path(0, str(tmp_path)).name == "history-0"
        assert history_directory_path(0, str(tmp_path), dev_id=3).name == ".history-0-3"

    def test_store_and_load_mapping(self, tmp_path):
        h = History(0, base_dir=str(tmp_path))
        h.store_mapping(70000, "bonded", {"k": "1u64"})
        # group sharding: 70000 // 65535 == 1
        p = (h.path / "group-1" / "block-70000" / "block-70000-bonded.json")
        assert p.exists()
        assert json.loads(h.load_mapping(70000, "bonded")) == {"k": "1u64"}

    def test_ledger_history_dump(self, tmp_path):
        import random
        from snarkvm_tpu.ledger.ledger import Ledger
        from snarkvm_tpu.console.account import PrivateKey
        keys = [PrivateKey.from_seed(i) for i in range(3)]
        ledger = Ledger(keys, random.Random(0), srs=None)
        ledger.history = History(0, base_dir=str(tmp_path))
        block = ledger.prepare_advance_to_next_beacon_block([])
        ledger.advance_to_next_block(block)
        raw = ledger.history.load_mapping(1, "bonded")
        assert isinstance(json.loads(raw), dict)
        for name in ("delegated", "metadata", "unbonding", "withdraw"):
            ledger.history.load_mapping(1, name)
