"""Quorum (Narwhal) block production: subdag -> block with anchor round,
weighted-median timestamp, subdag root; validation in check_next_block."""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.ledger.ledger import Ledger
from snarkvm_tpu.ledger.narwhal import (BatchHeader, BatchCertificate, Subdag,
                                        TransmissionID, weighted_median)
from snarkvm_tpu.ledger.committee import MIN_VALIDATOR_STAKE

rng = random.Random(321)


def _subdag(ledger, anchor_round, ts=None):
    members = list(ledger.committee.members)
    base_ts = ts or (ledger.latest_block.header.metadata.timestamp + 10)
    rounds = {}
    for rnd in (anchor_round - 1, anchor_round):
        certs = []
        for i, author in enumerate(members[:3]):
            hdr = BatchHeader(author=author, round=rnd,
                              timestamp=base_ts + i,
                              committee_id=1, transmission_ids=[],
                              previous_certificate_ids=[])
            certs.append(BatchCertificate(hdr, signatures=[
                (m, None) for m in members if m != author]))
        rounds[rnd] = certs
    return Subdag(rounds)


@pytest.fixture(scope="module")
def ledger():
    keys = [account.PrivateKey.new(rng) for _ in range(4)]
    return Ledger(keys, rng, srs=None)


class TestWeightedMedian:
    def test_median(self):
        assert weighted_median([(10, 1), (20, 1), (30, 1)]) == 20
        assert weighted_median([(10, 10), (20, 1), (30, 1)]) == 10
        assert weighted_median([(5, 1)]) == 5


class TestQuorumBlocks:
    def test_subdag_block_advances(self, ledger):
        sd = _subdag(ledger, anchor_round=2)
        block = ledger.prepare_advance_to_next_quorum_block(sd, [])
        md = block.header.metadata
        assert md.round == 2
        assert md.height == ledger.latest_height + 1
        assert block.header.subdag_root == sd.to_subdag_root()
        # timestamp = stake-weighted median of round-1 certificates
        assert md.timestamp == sd.timestamp(ledger.committee)
        ledger.advance_to_next_block(block)
        assert ledger.latest_round == 2

    def test_round_must_advance(self, ledger):
        sd = _subdag(ledger, anchor_round=ledger.latest_round)  # stale round
        block = ledger.prepare_advance_to_next_quorum_block(sd, [])
        with pytest.raises(ValueError, match="round"):
            ledger.check_next_block(block)

    def test_tampered_subdag_root_rejected(self, ledger):
        sd = _subdag(ledger, anchor_round=ledger.latest_round + 2)
        block = ledger.prepare_advance_to_next_quorum_block(sd, [])
        block.header.subdag_root += 1
        with pytest.raises(ValueError, match="subdag root"):
            ledger.check_next_block(block)

    def test_underpowered_subdag_rejected(self, ledger):
        members = list(ledger.committee.members)
        hdr = BatchHeader(author=members[0], round=ledger.latest_round + 2,
                          timestamp=ledger.latest_block.header.metadata.timestamp + 5,
                          committee_id=1, transmission_ids=[],
                          previous_certificate_ids=[])
        weak = BatchCertificate(hdr, signatures=[(members[1], None)])
        sd = Subdag({hdr.round: [weak]})
        with pytest.raises(ValueError, match="subdag"):
            ledger.prepare_advance_to_next_quorum_block(sd, [])

    def test_mixed_chain_beacon_then_quorum(self, ledger):
        b1 = ledger.prepare_advance_to_next_beacon_block([])
        ledger.advance_to_next_block(b1)
        sd = _subdag(ledger, anchor_round=ledger.latest_round + 2)
        b2 = ledger.prepare_advance_to_next_quorum_block(sd, [])
        ledger.advance_to_next_block(b2)
        assert ledger.latest_round == sd.anchor_round()
