"""Narwhal wire formats: TransmissionID, BatchHeader, BatchCertificate,
Subdag — byte-compatible with the reference
(ledger/narwhal/{transmission-id,batch-header,batch-certificate,subdag}/
src/bytes.rs). These are the production (Quorum/BFT) block-authority
payloads; read/write_authority in block_io dispatches here for variant 1.
"""
from __future__ import annotations

from .io import Reader, Writer
from ..ledger.narwhal import (TransmissionID, BatchHeader, BatchCertificate,
                              Subdag, MAX_CERTIFICATES, MAX_GC_ROUNDS,
                              MAX_TRANSMISSIONS_PER_BATCH)

SIGNATURE_SIZE = 32 * 4       # challenge + response + pk_sig + pr_sig


def read_signature(r: Reader):
    """Console account Signature (challenge, response, compute key)."""
    from ..console.account import Signature, ComputeKey
    from ..console.types import _group_from_x
    from ..console import network as N
    challenge = r.scalar()
    response = r.scalar()
    pk_sig = _group_from_x(r.group())
    pr_sig = _group_from_x(r.group())
    sk_prf = N.hash_to_scalar_psd(4, [pk_sig[0], pr_sig[0]])
    return Signature(challenge, response, ComputeKey(pk_sig, pr_sig, sk_prf))


def write_signature(w: Writer, sig) -> None:
    w.field(sig.challenge)
    w.field(sig.response)
    w.field(sig.compute_key.pk_sig[0])
    w.field(sig.compute_key.pr_sig[0])


def read_transmission_id(r: Reader) -> TransmissionID:
    variant = r.u8()
    if variant == 0:
        return TransmissionID("ratification", 0, 0)
    if variant == 1:
        return TransmissionID("solution", r.u64(), r.u128())
    if variant == 2:
        return TransmissionID("transaction", r.field(), r.u128())
    raise ValueError(f"bad transmission-id variant {variant}")


def write_transmission_id(w: Writer, tid: TransmissionID) -> None:
    if tid.kind == "ratification":
        w.u8(0)
    elif tid.kind == "solution":
        w.u8(1)
        w.u64(tid.id)
        w.u128(tid.checksum)
    elif tid.kind == "transaction":
        w.u8(2)
        w.field(tid.id)
        w.u128(tid.checksum)
    else:
        raise ValueError(f"bad transmission kind {tid.kind}")


def read_batch_header(r: Reader) -> BatchHeader:
    r.version(1, "batch header")
    batch_id = r.field()
    author = r.group()
    round_ = r.u64()
    timestamp = r.i64()
    committee_id = r.field()
    n_tids = r.u32()
    if n_tids > MAX_TRANSMISSIONS_PER_BATCH:
        raise ValueError("too many transmission ids")
    tids = [read_transmission_id(r) for _ in range(n_tids)]
    n_prev = r.u16()
    if n_prev > MAX_CERTIFICATES:
        raise ValueError("too many previous certificate ids")
    prev = [r.field() for _ in range(n_prev)]
    sig = read_signature(r)
    hdr = BatchHeader(author, round_, timestamp, committee_id, tids, prev,
                      signature=sig)
    if hdr.batch_id() != batch_id:
        raise ValueError("invalid batch id")
    return hdr


def write_batch_header(w: Writer, hdr: BatchHeader) -> None:
    w.u8(1)
    w.field(hdr.batch_id())
    w.field(hdr.author)
    w.u64(hdr.round)
    w.i64(hdr.timestamp)
    w.field(hdr.committee_id)
    w.u32(len(hdr.transmission_ids))
    for tid in hdr.transmission_ids:
        write_transmission_id(w, tid)
    w.u16(len(hdr.previous_certificate_ids))
    for cid in hdr.previous_certificate_ids:
        w.field(cid)
    write_signature(w, hdr.signature)


def read_batch_certificate(r: Reader) -> BatchCertificate:
    r.version(1, "batch certificate")
    hdr = read_batch_header(r)
    n_sigs = r.u16()
    if n_sigs > MAX_CERTIFICATES:
        raise ValueError("too many signatures")
    sigs = [read_signature(r) for _ in range(n_sigs)]
    if not sigs:
        raise ValueError("batch certificate must contain signatures")
    return BatchCertificate(hdr, sigs)


def write_batch_certificate(w: Writer, cert: BatchCertificate) -> None:
    w.u8(1)
    write_batch_header(w, cert.header)
    w.u16(len(cert.signatures))
    for sig in cert.signatures:
        write_signature(w, sig)


def read_subdag(r: Reader) -> Subdag:
    r.version(1, "subdag")
    n_rounds = r.u32()
    if n_rounds > MAX_GC_ROUNDS:
        raise ValueError("too many subdag rounds")
    rounds = {}
    for _ in range(n_rounds):
        rnd = r.u64()
        n_certs = r.u16()
        if n_certs > MAX_CERTIFICATES:
            raise ValueError("too many certificates in round")
        rounds[rnd] = [read_batch_certificate(r) for _ in range(n_certs)]
    return Subdag(rounds)


def write_subdag(w: Writer, sd: Subdag) -> None:
    w.u8(1)
    w.u32(len(sd.rounds))
    for rnd in sorted(sd.rounds):
        w.u64(rnd)
        certs = sd.rounds[rnd]
        w.u16(len(certs))
        for cert in certs:
            write_batch_certificate(w, cert)
