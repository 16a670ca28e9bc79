"""Validator committee (ledger/committee/src/lib.rs): stake bookkeeping,
quorum thresholds, stake-weighted leader election (hash_to_group_psd4 of
the round, cast-lossy to u64 mod total stake, walk members sorted by
descending address x-coordinate).
"""
from __future__ import annotations

from ..console import network as N

MIN_VALIDATOR_STAKE = 10_000_000_000_000
MIN_DELEGATOR_STAKE = 10_000_000_000
MAX_DELEGATORS = 100_000
MAX_COMMITTEE_SIZE = 16          # BatchHeader::MAX_CERTIFICATES
COMMITTEE_LOOKBACK_RANGE = 100   # MAX_GC_ROUNDS


class Committee:
    def __init__(self, starting_round: int, members: dict):
        """members: address_x (int) -> (stake, is_open, commission)."""
        assert len(members) >= 3, "committee must have at least 3 members"
        assert len(members) <= MAX_COMMITTEE_SIZE
        for stake, _, commission in members.values():
            assert stake >= MIN_VALIDATOR_STAKE, "member below minimum stake"
            assert commission <= 100
        self.starting_round = starting_round
        self.members = dict(members)
        self.total_stake = sum(s for s, _, _ in members.values())
        # live gauge (reference: ledger/committee/src/lib.rs:97-98)
        from ..utils import metrics
        metrics.gauge(metrics.COMMITTEE_TOTAL_STAKE, self.total_stake)

    @classmethod
    def new_genesis(cls, members):
        return cls(0, members)

    def get_stake(self, address_x: int) -> int:
        return self.members.get(address_x, (0, False, 0))[0]

    def is_committee_member(self, address_x: int) -> bool:
        return address_x in self.members

    def quorum_threshold(self) -> int:
        return self.total_stake * 2 // 3 + 1

    def availability_threshold(self) -> int:
        return (self.total_stake + 2) // 3

    def is_quorum_threshold_reached(self, addresses) -> bool:
        return sum(self.get_stake(a) for a in set(addresses)) >= self.quorum_threshold()

    def sorted_members(self):
        """Descending by address x-coordinate (lib.rs:155)."""
        return sorted(self.members.items(), key=lambda kv: kv[0], reverse=True)

    def get_leader(self, current_round: int) -> int:
        assert current_round >= self.starting_round
        seed = [current_round]
        hx = N.hash_to_group_psd(4, seed)[0]
        stake_index = (hx & ((1 << 64) - 1)) % self.total_stake
        current = 0
        for address_x, (stake, _, _) in self.sorted_members():
            current += stake
            if current >= stake_index:
                return address_x
        raise AssertionError("no leader found")
