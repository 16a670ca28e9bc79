"""Narwhal wire-format round-trips (VERDICT item 6): TransmissionID /
BatchHeader / BatchCertificate / Subdag / quorum Authority byte formats,
with real account signatures over [batch_id].

Reference parity targets: ledger/narwhal/*/src/bytes.rs,
batch-header/src/to_id.rs:33 (byte preimage), batch-certificate/src/
lib.rs:53 (signature checks; certificate id == batch id),
ledger/authority/src/bytes.rs (variant 1).
"""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.formats.io import Reader, Writer
from snarkvm_tpu.formats import narwhal_io as nio
from snarkvm_tpu.formats import block_io
from snarkvm_tpu.ledger.narwhal import (TransmissionID, BatchHeader,
                                        BatchCertificate, Subdag)
from snarkvm_tpu.ledger.committee import Committee

rng = random.Random(0xBF7)


@pytest.fixture(scope="module")
def keys():
    return [account.PrivateKey.new(rng) for _ in range(4)]


def _tids():
    return [
        TransmissionID("ratification", 0, 0),
        TransmissionID("solution", rng.randrange(1 << 64),
                       rng.randrange(1 << 128)),
        TransmissionID("transaction", rng.randrange(1 << 250),
                       rng.randrange(1 << 128)),
    ]


def _header(key, round_=7, prev=()):
    return BatchHeader.new(key, round_, 1_723_000_000, 123, _tids(),
                           list(prev), rng)


def _certificate(keys, author_idx=0, round_=7, prev=()):
    hdr = _header(keys[author_idx], round_, prev)
    bid = hdr.batch_id()
    sigs = [account.Signature.sign(k, [bid], rng)
            for i, k in enumerate(keys) if i != author_idx]
    return BatchCertificate(hdr, sigs)


def test_transmission_id_roundtrip():
    for tid in _tids():
        w = Writer()
        nio.write_transmission_id(w, tid)
        raw = w.getvalue()
        got = nio.read_transmission_id(Reader(raw))
        assert got == tid
        w2 = Writer()
        nio.write_transmission_id(w2, got)
        assert w2.getvalue() == raw


def test_batch_header_roundtrip_and_signature(keys):
    hdr = _header(keys[0])
    assert hdr.verify_signature()
    w = Writer()
    nio.write_batch_header(w, hdr)
    raw = w.getvalue()
    got = nio.read_batch_header(Reader(raw))
    assert got.batch_id() == hdr.batch_id()
    assert got.verify_signature()
    w2 = Writer()
    nio.write_batch_header(w2, got)
    assert w2.getvalue() == raw


def test_batch_header_bad_id_rejected(keys):
    hdr = _header(keys[0])
    w = Writer()
    nio.write_batch_header(w, hdr)
    raw = bytearray(w.getvalue())
    raw[2] ^= 1  # corrupt the leading batch id field
    with pytest.raises(ValueError, match="invalid batch id"):
        nio.read_batch_header(Reader(bytes(raw)))


def test_batch_certificate_roundtrip_and_quorum(keys):
    cert = _certificate(keys)
    assert cert.certificate_id() == cert.header.batch_id()
    assert cert.verify_signatures()
    from snarkvm_tpu.ledger.committee import MIN_VALIDATOR_STAKE
    members = {k.to_address()[0]: (MIN_VALIDATOR_STAKE, True, 0) for k in keys}
    committee = Committee(7, members)
    assert cert.is_quorum_signed(committee)
    w = Writer()
    nio.write_batch_certificate(w, cert)
    raw = w.getvalue()
    got = nio.read_batch_certificate(Reader(raw))
    assert got.certificate_id() == cert.certificate_id()
    assert got.verify_signatures()
    w2 = Writer()
    nio.write_batch_certificate(w2, got)
    assert w2.getvalue() == raw


def test_certificate_author_self_sign_rejected(keys):
    hdr = _header(keys[0])
    bid = hdr.batch_id()
    sigs = [account.Signature.sign(keys[0], [bid], rng)]  # author signs
    assert not BatchCertificate(hdr, sigs).verify_signatures()


def test_subdag_and_authority_roundtrip(keys):
    c1 = _certificate(keys, 0, round_=6)
    c2 = _certificate(keys, 1, round_=6)
    c3 = _certificate(keys, 2, round_=7,
                      prev=[c1.certificate_id(), c2.certificate_id()])
    sd = Subdag({6: [c1, c2], 7: [c3]})
    w = Writer()
    nio.write_subdag(w, sd)
    raw = w.getvalue()
    got = nio.read_subdag(Reader(raw))
    assert sorted(got.rounds) == [6, 7]
    assert [c.certificate_id() for c in got.rounds[6]] == \
        [c1.certificate_id(), c2.certificate_id()]
    w2 = Writer()
    nio.write_subdag(w2, got)
    assert w2.getvalue() == raw

    # quorum authority (variant 1) through block_io
    auth = block_io.Authority(1, subdag=sd)
    w3 = Writer()
    block_io.write_authority(w3, auth)
    raw3 = w3.getvalue()
    assert raw3[0] == 1
    got3 = block_io.read_authority(Reader(raw3))
    w4 = Writer()
    block_io.write_authority(w4, got3)
    assert w4.getvalue() == raw3
