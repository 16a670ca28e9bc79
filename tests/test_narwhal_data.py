"""Narwhal Data wrapper, transmission checksums, MerklePuzzle variant,
TestRng, and committee property tests (reference: ledger/narwhal/data,
ledger/puzzle/epoch/merkle, utilities/src/rand.rs,
ledger/committee/src/prop_tests.rs)."""
import random

import pytest

from snarkvm_tpu.ledger.narwhal import Data, Transmission, TransmissionID
from snarkvm_tpu.ledger.puzzle import MerklePuzzle, PartialSolution, leaves_to_proof_target
from snarkvm_tpu.ledger.committee import Committee, MIN_VALIDATOR_STAKE, MAX_COMMITTEE_SIZE
from snarkvm_tpu.utils.rand import TestRng, XorShiftRng
from snarkvm_tpu.utils.chacha import ChaCha20Rng
from snarkvm_tpu.utils.encoding import sha256, sha256d


class _Obj:
    def __init__(self, raw):
        self.raw = raw

    def to_bytes_le(self):
        return self.raw


def test_data_checksum_object_buffer_agree():
    raw = bytes(range(64))
    assert Data.object(_Obj(raw)).to_checksum() == Data.buffer(raw).to_checksum()
    assert Data.buffer(raw).to_checksum() != Data.buffer(raw + b"\0").to_checksum()
    c = Data.buffer(raw).to_checksum()
    assert 0 <= c < 1 << 128


def test_data_deserialize_idempotent():
    d = Data.buffer(b"\x01\x02")
    obj = d.deserialize(lambda b: _Obj(b))
    assert d.kind == "object" and obj.raw == b"\x01\x02"
    assert d.deserialize(lambda b: (_ for _ in ()).throw(AssertionError)) is obj


def test_transmission_checksums():
    assert Transmission("ratification", b"x").to_checksum() is None
    t = Transmission("transaction", b"\xAA" * 10)
    tid = t.to_transmission_id(77)
    assert tid == TransmissionID("transaction", 77, t.to_checksum())
    assert Transmission("solution", Data.buffer(b"s")).to_checksum() == \
        Data.buffer(b"s").to_checksum()


def test_merkle_puzzle_num_leaves():
    p = MerklePuzzle()
    for eh in (1, 0xDEADBEEF, (1 << 250) + 12345):
        n = p.num_leaves(eh)
        assert p.MIN_NUMBER_OF_LEAVES <= n <= p.MAX_NUMBER_OF_LEAVES
        assert n == p.num_leaves(eh)  # epoch-deterministic


def test_merkle_puzzle_leaves_deterministic():
    class Small(MerklePuzzle):
        MIN_NUMBER_OF_LEAVES = 8
        MAX_NUMBER_OF_LEAVES = 16

    p = Small()
    sol = PartialSolution(epoch_hash=42, address_x=7, counter=3)
    leaves = p.to_leaves(sol)
    assert p.MIN_NUMBER_OF_LEAVES <= len(leaves) <= p.MAX_NUMBER_OF_LEAVES
    assert all(len(l) == 253 for l in leaves)
    assert leaves == p.to_leaves(sol)
    # different counter -> different solution id -> different leaves
    assert leaves != p.to_leaves(PartialSolution(42, 7, 4))
    target = leaves_to_proof_target(leaves)
    assert target >= 1


def test_gen_range_u64_inclusive():
    rng = ChaCha20Rng.seed_from_u64(5)
    vals = [rng.gen_range_u64_inclusive(100_000, 200_000) for _ in range(200)]
    assert all(100_000 <= v <= 200_000 for v in vals)
    assert len(set(vals)) > 100
    # degenerate single-point range
    assert ChaCha20Rng.seed_from_u64(1).gen_range_u64_inclusive(9, 9) == 9
    # determinism
    rng2 = ChaCha20Rng.seed_from_u64(5)
    assert vals == [rng2.gen_range_u64_inclusive(100_000, 200_000) for _ in range(200)]


def test_xorshift_testrng():
    a, b = TestRng.fixed(123), TestRng.fixed(123)
    assert [a.next_u64() for _ in range(8)] == [b.next_u64() for _ in range(8)]
    assert TestRng.fixed(124).next_u64() != TestRng.fixed(123).next_u64()
    # xorshift128 recurrence pinned by hand: one step from a known state
    r = XorShiftRng(1, 2, 3, 4)
    x, w = 1, 4
    t = (x ^ (x << 11)) & 0xFFFFFFFF
    expect = (w ^ (w >> 19) ^ (t ^ (t >> 8))) & 0xFFFFFFFF
    assert r.next_u32() == expect
    with pytest.raises(ValueError):
        XorShiftRng(0, 0, 0, 0)
    vals = [TestRng.fixed(9).gen_range(1000) for _ in range(50)]
    assert all(0 <= v < 1000 for v in vals)


def test_sha256_utils():
    assert sha256(b"abc").hex() == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert sha256d(b"abc") == sha256(sha256(b"abc"))


# --- committee property tests (prop_tests.rs analog, randomized) ---

def _random_committee(rng, n=None):
    n = n or rng.randint(3, MAX_COMMITTEE_SIZE)
    members = {}
    while len(members) < n:
        addr = rng.getrandbits(253)
        stake = MIN_VALIDATOR_STAKE + rng.randrange(10**15)
        members[addr] = (stake, rng.random() < 0.5, rng.randrange(101))
    return Committee(rng.randrange(1 << 32), members)


def test_committee_properties():
    rng = random.Random(2024)
    for _ in range(25):
        c = _random_committee(rng)
        # total stake is the member sum
        assert c.total_stake == sum(s for s, _, _ in c.members.values())
        # quorum threshold: strictly more than 2/3 of stake
        q = c.quorum_threshold()
        assert 3 * (q - 1) <= 2 * c.total_stake < 3 * q
        # availability threshold: at least 1/3 (ceil)
        f = c.availability_threshold()
        assert 3 * f >= c.total_stake > 3 * (f - 1)
        # all members together always reach quorum; no single member does
        assert c.is_quorum_threshold_reached(list(c.members))
        biggest = max(c.members, key=lambda a: c.members[a][0])
        if len(c.members) > 3:
            assert not c.is_quorum_threshold_reached([biggest])
        # leader is deterministic and always a member
        r = c.starting_round + rng.randrange(1000)
        leader = c.get_leader(r)
        assert leader in c.members
        assert leader == c.get_leader(r)
        # sorted_members is descending by address
        xs = [a for a, _ in c.sorted_members()]
        assert xs == sorted(xs, reverse=True)


def test_committee_rejects_invalid():
    rng = random.Random(7)
    good = _random_committee(rng, 4)
    with pytest.raises(AssertionError):
        Committee(0, dict(list(good.members.items())[:2]))  # too few
    bad = dict(good.members)
    bad[12345] = (MIN_VALIDATOR_STAKE - 1, True, 0)
    with pytest.raises(AssertionError):
        Committee(0, bad)  # below minimum stake
    bad = dict(good.members)
    bad[12345] = (MIN_VALIDATOR_STAKE, True, 101)
    with pytest.raises(AssertionError):
        Committee(0, bad)  # commission > 100


def test_decouple_transmissions():
    from snarkvm_tpu.ledger.narwhal import (
        decouple_transmissions, Subdag, BatchHeader, BatchCertificate)
    rng2 = random.Random(11)
    tids = [TransmissionID("transaction", 1, 0),
            TransmissionID("solution", 2, 0),
            TransmissionID("ratification", 3, 0),
            TransmissionID("transaction", 4, 0)]
    hdr1 = BatchHeader(author=1, round=3, timestamp=10, committee_id=0,
                       transmission_ids=tids[:2], previous_certificate_ids=[])
    hdr2 = BatchHeader(author=2, round=4, timestamp=11, committee_id=0,
                       transmission_ids=tids[1:], previous_certificate_ids=[])
    sub = Subdag({3: [BatchCertificate(hdr1, [])],
                  4: [BatchCertificate(hdr2, [])]})
    tr = {tids[0]: Transmission("transaction", b"t1"),
          tids[1]: Transmission("solution", b"s1"),
          tids[2]: Transmission("ratification", b"r1")}
    # tids[3] missing -> aborted
    rats, sols, txs, aborted = decouple_transmissions(sub, tr)
    assert txs == [b"t1"] and sols == [b"s1"] and rats == [b"r1"]
    assert aborted == [tids[3]]
