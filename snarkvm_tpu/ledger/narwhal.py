"""Narwhal DAG-BFT data structures (ledger/narwhal/): BatchHeader,
BatchCertificate, Subdag, Transmission — consumed by the consensus layer
(snarkOS-side in the reference; structural + validation logic here).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from ..console import network as N
from ..console.types import int_to_bits_le, bytes_to_bits_le
from .committee import Committee

MAX_CERTIFICATES = 16          # batch-header/src/lib.rs:60 (100 under test)
MAX_GC_ROUNDS = 100
MAX_TRANSMISSIONS_PER_BATCH = 50


@dataclass(frozen=True)
class TransmissionID:
    kind: str                  # "ratification" | "solution" | "transaction"
    id: int
    checksum: int = 0


@dataclass
class Data:
    """Lazy transmission payload (narwhal/data/src/lib.rs:33):
    Object(deserialized) | Buffer(raw bytes). Deserialization of gossiped
    payloads is deferred until the consensus layer actually needs the
    object; checksums are computable from either form."""
    kind: str                  # "object" | "buffer"
    value: object              # object with to_bytes_le(), or bytes

    @classmethod
    def object(cls, obj) -> "Data":
        return cls("object", obj)

    @classmethod
    def buffer(cls, raw: bytes) -> "Data":
        return cls("buffer", raw)

    def to_bytes_le(self) -> bytes:
        if self.kind == "buffer":
            return self.value
        return self.value.to_bytes_le()

    def deserialize(self, parse):
        """Materialize Buffer -> Object via `parse(bytes)` (idempotent)."""
        if self.kind == "buffer":
            self.kind, self.value = "object", parse(self.value)
        return self.value

    def to_checksum(self) -> int:
        """narwhal/data/src/lib.rs:39 — u128 from the first 128 bits of
        sha3-256 over the LE bits of the serialized payload
        (N::TransmissionChecksum = u128, console/network mainnet_v0.rs:135)."""
        bits = bytes_to_bits_le(self.to_bytes_le())
        digest_bits = N.hash_sha3(256, bits)
        v = 0
        for i, b in enumerate(digest_bits[:128]):
            v |= int(b) << i
        return v


@dataclass
class Transmission:
    kind: str                  # "ratification" | "solution" | "transaction"
    payload: object            # Data, bytes, or a rich object

    def to_checksum(self) -> int | None:
        """transmission/src/lib.rs:70 — ratifications carry no checksum."""
        if self.kind == "ratification":
            return None
        data = self.payload if isinstance(self.payload, Data) else (
            Data.buffer(self.payload) if isinstance(self.payload, (bytes, bytearray))
            else Data.object(self.payload))
        return data.to_checksum()

    def to_transmission_id(self, id: int) -> TransmissionID:
        checksum = self.to_checksum()
        return TransmissionID(self.kind, id, checksum or 0)


def _tid_bytes(tid: TransmissionID) -> bytes:
    """TransmissionID wire bytes (narwhal/transmission-id/src/bytes.rs):
    variant u8; Solution -> u64 id + u128 checksum; Transaction ->
    field id (32B) + u128 checksum."""
    if tid.kind == "ratification":
        return bytes([0])
    if tid.kind == "solution":
        return (bytes([1]) + int(tid.id).to_bytes(8, "little")
                + int(tid.checksum).to_bytes(16, "little"))
    if tid.kind == "transaction":
        return (bytes([2]) + int(tid.id).to_bytes(32, "little")
                + int(tid.checksum).to_bytes(16, "little"))
    raise ValueError(f"bad transmission kind {tid.kind}")


@dataclass
class BatchHeader:
    author: int                # address x-coordinate
    round: int
    timestamp: int
    committee_id: int
    transmission_ids: list
    previous_certificate_ids: list
    signature: object = None   # console.account.Signature over [batch_id]

    def batch_id(self) -> int:
        """compute_batch_id (batch-header/src/to_id.rs:33): BHP1024 over
        the LE bits of the byte preimage: author(32) ++ round u64 ++
        timestamp i64 ++ committee_id(32) ++ u32 #tids ++ tid wire bytes
        ++ u32 #prev_cert_ids ++ cert id fields(32 each)."""
        pre = bytearray()
        pre += int(self.author).to_bytes(32, "little")
        pre += int(self.round).to_bytes(8, "little")
        pre += int(self.timestamp % (1 << 64)).to_bytes(8, "little")
        pre += int(self.committee_id).to_bytes(32, "little")
        pre += len(self.transmission_ids).to_bytes(4, "little")
        for tid in self.transmission_ids:
            pre += _tid_bytes(tid)
        pre += len(self.previous_certificate_ids).to_bytes(4, "little")
        for cid in self.previous_certificate_ids:
            pre += int(cid).to_bytes(32, "little")
        return N.hash_bhp(1024, bytes_to_bits_le(bytes(pre)))

    @classmethod
    def new(cls, private_key, round: int, timestamp: int, committee_id: int,
            transmission_ids, previous_certificate_ids, rng):
        """BatchHeader::new (batch-header/src/lib.rs:120): sign [batch_id]
        with the author's account key."""
        from ..console.account import Signature
        author = private_key.to_address()[0]
        hdr = cls(author, round, timestamp, committee_id,
                  list(transmission_ids), list(previous_certificate_ids))
        hdr.signature = Signature.sign(private_key, [hdr.batch_id()], rng)
        return hdr

    def verify_signature(self) -> bool:
        from ..console.types import _group_from_x
        if self.signature is None:
            return False
        return self.signature.verify(_group_from_x(self.author),
                                     [self.batch_id()])

    def validate(self) -> bool:
        return (len(self.transmission_ids) <= MAX_TRANSMISSIONS_PER_BATCH
                and self.round >= 0)


@dataclass
class BatchCertificate:
    header: BatchHeader
    signatures: list           # [console.account.Signature] over [batch_id]

    def certificate_id(self) -> int:
        """The certificate ID IS the batch ID
        (batch-certificate/src/lib.rs:99 `id()`)."""
        return self.header.batch_id()

    def verify_signatures(self) -> bool:
        """batch-certificate/src/lib.rs:53 — every signature verifies
        against its own recovered address over [batch_id], signers are
        unique and exclude the author."""
        bid = self.header.batch_id()
        if not self.signatures:
            return False
        seen = set()
        for sig in self.signatures:
            addr = sig.compute_key.to_address()
            if addr[0] == self.header.author or addr[0] in seen:
                return False
            seen.add(addr[0])
            if not sig.verify(addr, [bid]):
                return False
        return self.header.verify_signature()

    def signer_xs(self):
        """Signer address x-coords. Accepts console Signature objects
        (wire form) or legacy (addr_x, sig) tuples (test helpers)."""
        out = []
        for sig in self.signatures:
            if isinstance(sig, tuple):
                out.append(sig[0])
            else:
                out.append(sig.compute_key.to_address()[0])
        return out

    def is_quorum_signed(self, committee: Committee) -> bool:
        signers = set(self.signer_xs()) | {self.header.author}
        return committee.is_quorum_threshold_reached(signers)


@dataclass
class Subdag:
    """round -> [BatchCertificate], the Quorum authority payload
    (subdag/src/lib.rs:114)."""
    rounds: dict = field(default_factory=dict)

    def anchor_round(self) -> int:
        return max(self.rounds) if self.rounds else 0

    def leader_certificate(self) -> BatchCertificate | None:
        certs = self.rounds.get(self.anchor_round())
        return certs[0] if certs else None

    def validate(self, committee: Committee) -> bool:
        if not self.rounds:
            return False
        for rnd, certs in self.rounds.items():
            if len(certs) > MAX_CERTIFICATES:
                return False
            for cert in certs:
                if cert.header.round != rnd:
                    return False
                if not cert.is_quorum_signed(committee):
                    return False
        # even anchor round with a leader certificate
        leader = self.leader_certificate()
        return leader is not None

    def transmission_ids(self):
        """Deduplicated transmission ids in commit order (oldest round first)."""
        seen = []
        for rnd in sorted(self.rounds):
            for cert in self.rounds[rnd]:
                for tid in cert.header.transmission_ids:
                    if tid not in seen:
                        seen.append(tid)
        return seen

    def timestamp(self, committee: Committee) -> int:
        """Stake-weighted median of the (anchor_round - 1) certificate
        timestamps (subdag/src/lib.rs:190)."""
        anchor = self.anchor_round()
        pairs = [(cert.header.timestamp, committee.get_stake(cert.header.author))
                 for rnd, certs in self.rounds.items() if rnd == anchor - 1
                 for cert in certs]
        return weighted_median(pairs)

    def to_subdag_root(self) -> int:
        """BHP Merkle tree (depth SUBDAG_CERTIFICATES_DEPTH=16) over
        per-round concatenated certificate-id bits (subdag/src/lib.rs:206)."""
        from ..console.merkle import MerkleTree, BHPHasher
        from ..console.types import int_to_bits_le
        leaves = []
        for rnd in sorted(self.rounds):
            bits = []
            for cert in self.rounds[rnd]:
                bits += int_to_bits_le(cert.certificate_id(), 253)
            leaves.append(bits)
        return MerkleTree(16, BHPHasher(1024, 512), leaves).root


def decouple_transmissions(subdag: Subdag, transmissions: dict):
    """ledger/src/helpers/bft.rs:30 — split a committed subdag's
    transmissions (in commit order, deduplicated) into (ratifications,
    solutions, transactions, aborted_transmission_ids). `transmissions`
    maps TransmissionID -> Transmission; ids the caller cannot supply
    (already garbage-collected) are reported aborted."""
    ratifications, solutions, transactions, aborted = [], [], [], []
    for tid in subdag.transmission_ids():
        tr = transmissions.get(tid)
        if tr is None:
            aborted.append(tid)
            continue
        payload = tr.payload.value if isinstance(tr.payload, Data) else tr.payload
        if tid.kind == "ratification":
            ratifications.append(payload)
        elif tid.kind == "solution":
            solutions.append(payload)
        else:
            transactions.append(payload)
    return ratifications, solutions, transactions, aborted


def weighted_median(timestamps_and_stake) -> int:
    """subdag/src/lib.rs:84 — smallest timestamp whose accumulated stake
    reaches half the total."""
    pairs = sorted(timestamps_and_stake, key=lambda p: p[0])
    total = sum(s for _, s in pairs)
    current, acc = 0, 0
    for ts, stake in pairs:
        acc += stake
        current = ts
        if acc * 2 >= total:
            break
    return current


@dataclass
class Authority:
    """Beacon(signature) | Quorum(subdag) (ledger/authority/src/lib.rs:58)."""
    kind: str
    payload: object

    @classmethod
    def new_beacon(cls, signature):
        return cls("beacon", signature)

    @classmethod
    def new_quorum(cls, subdag: Subdag):
        return cls("quorum", subdag)
