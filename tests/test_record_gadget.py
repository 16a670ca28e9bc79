"""In-circuit record machinery (VERDICT r2 #5): commitment, serial
number from gamma, tag, encryption — and the Request::verify record arm
(circuit/program/src/request/verify.rs:214-266)."""
import random

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.console import account
from snarkvm_tpu.console import network as N
from snarkvm_tpu.console.record import (Record, Entry, serial_number_from_gamma,
                                        record_tag)
from snarkvm_tpu.console.request import Request
from snarkvm_tpu.console.types import Identifier, Plaintext
from snarkvm_tpu.circuit.builder import CircuitBuilder, PRIVATE
from snarkvm_tpu.circuit.types import CField, CGroup
from snarkvm_tpu.circuit import record_gadget as RG

rng = random.Random(4242)


def _sample_record(owner):
    nonce = N.g_scalar_multiply(rng.randrange(P.S))
    return Record(
        owner=owner, owner_visibility="private",
        data=[(Identifier("microcredits"),
               Entry("private", Plaintext.literal("u64", 1_000_000)))],
        nonce=nonce)


def test_record_commitment_gadget_matches_console():
    sk = account.PrivateKey.new(rng)
    rec = _sample_record(sk.to_address())
    want = rec.to_commitment("credits.aleo", "credits")
    b = CircuitBuilder()
    rg = RG.RecordGadget.inject(b, rec)
    got = rg.to_commitment("credits.aleo", "credits")
    assert b.value_of(got.lc) == want
    assert b.is_satisfied()


def test_serial_number_and_tag_gadgets_match_console():
    from snarkvm_tpu.curves import edwards as ed
    sk = account.PrivateKey.new(rng)
    rec = _sample_record(sk.to_address())
    com = rec.to_commitment("credits.aleo", "credits")
    h = N.hash_to_group_psd(2, [N.SERIAL_NUMBER_DOMAIN, com])
    gamma = ed.mul(h, sk.sk_sig % P.S)
    want_sn = serial_number_from_gamma(gamma, com)
    sk_tag = rng.randrange(P.R)
    want_tag = record_tag(sk_tag, com)

    b = CircuitBuilder()
    com_g = CField.new(b, PRIVATE, com)
    gamma_g = CGroup.new(b, PRIVATE, gamma)
    sn_g = RG.serial_number_from_gamma_gadget(b, gamma_g, com_g)
    assert b.value_of(sn_g.lc) == want_sn
    tag_g = RG.record_tag_gadget(b, CField.new(b, PRIVATE, sk_tag), com_g)
    assert b.value_of(tag_g.lc) == want_tag
    assert b.is_satisfied()


def test_request_verify_gadget_record_arm():
    """Full Request::verify with a record input: satisfied circuit, and
    the public vector carries (sn, tag) for the record input."""
    from snarkvm_tpu.circuit.request_gadget import verify_request_gadget

    sk = account.PrivateKey.new(rng)
    rec = _sample_record(sk.to_address())
    types = [("record", "credits")]
    req = Request.sign(sk, "credits.aleo", "noop", [rec], types, rng)
    assert req.verify(types)

    b = CircuitBuilder()
    rg = RG.RecordGadget.inject(b, rec)
    verify_request_gadget(b, req, types, [rg])
    assert b.is_satisfied(), "record-arm request circuit unsatisfied"
    iid = req.input_ids[0]
    # publics: [tpk.x, tpk.y, tcm, scm, sn, tag, is_root, parent.x, parent.y]
    pubs = b.public
    assert iid.fields[2] in pubs and iid.fields[3] in pubs


def test_encrypt_record_gadget_matches_console():
    sk = account.PrivateKey.new(rng)
    rec = _sample_record(sk.to_address())
    randomizer = rng.randrange(1 << 250)
    from snarkvm_tpu.curves import edwards as ed
    rec = Record(rec.owner, rec.owner_visibility, rec.data,
                 N.g_scalar_multiply(randomizer))
    enc = rec.encrypt(randomizer)
    want_bits = enc.to_bits_le()
    want_checksum = N.hash_bhp(1024, want_bits)

    b = CircuitBuilder()
    rg = RG.RecordGadget.inject(b, rec)
    rand_bits = [(randomizer >> i) & 1 for i in range(251)]
    from snarkvm_tpu.circuit.types import CBool
    rb = [CBool.new(b, PRIVATE, v) for v in rand_bits]
    ct_bits = RG.encrypt_record_gadget(b, rg, rb)
    got_bits = [bool(b.value_of(x.lc)) for x in ct_bits]
    assert got_bits == [bool(v) for v in want_bits]
    from snarkvm_tpu.circuit.bhp_gadget import bhp_hash_gadget
    cks = bhp_hash_gadget(b, 1024, "AleoBHP1024", ct_bits)
    assert b.value_of(cks.lc) == want_checksum
    assert b.is_satisfied()
