"""Record encryption/decryption, commitments, serial numbers."""
import random

from snarkvm_tpu.console import account, network as N
from snarkvm_tpu.console.record import (
    Record, Entry, serial_number, record_tag, plaintext_from_fields,
)
from snarkvm_tpu.console.types import Plaintext, Identifier

rng = random.Random(77)


def _sample_record():
    sk = account.PrivateKey.new(rng)
    owner = sk.to_address()
    randomizer = rng.randrange(N.SCALAR_MOD if hasattr(N, "SCALAR_MOD") else 2**250)
    from snarkvm_tpu.params import bls12_377 as P
    randomizer = rng.randrange(P.S)
    nonce = N.g_scalar_multiply(randomizer)
    data = [
        (Identifier("amount"), Entry("private", Plaintext.literal("u64", 12345))),
        (Identifier("token_id"), Entry("public", Plaintext.literal("field", 999))),
    ]
    rec = Record(owner, "private", data, nonce)
    return sk, rec, randomizer


def test_encrypt_decrypt_roundtrip():
    sk, rec, randomizer = _sample_record()
    enc = rec.encrypt(randomizer)
    assert enc.is_ciphertext
    # private entry is hidden
    assert not isinstance(enc.data[0][1].value, Plaintext)
    # public entry passes through
    assert isinstance(enc.data[1][1].value, Plaintext)
    dec = enc.decrypt(sk.to_view_key())
    assert dec.owner == rec.owner
    assert dec.data[0][1].value == rec.data[0][1].value
    # wrong view key decrypts garbage (wrong owner or an invalid point)
    other = account.PrivateKey.new(rng)
    from snarkvm_tpu.curves.edwards import mul as _edmul
    try:
        wrong = enc.decrypt_symmetric_unchecked(_edmul(enc.nonce, other.to_view_key())[0])
        assert wrong.owner != rec.owner
    except (ValueError, AssertionError):
        pass  # random x usually is not a valid subgroup point


def test_commitment_and_serial_number():
    sk, rec, _ = _sample_record()
    cm = rec.to_commitment("credits.aleo", "credits")
    assert 0 < cm
    sn1 = serial_number(sk.sk_sig, cm)
    sn2 = serial_number(sk.sk_sig, cm)
    assert sn1 == sn2
    assert serial_number(sk.sk_sig, cm + 1) != sn1
    assert record_tag(5, cm) != record_tag(6, cm)


def test_plaintext_field_roundtrip():
    pt = Plaintext.struct([
        ("a", Plaintext.literal("u64", 77)),
        ("b", Plaintext.literal("boolean", True)),
        ("c", Plaintext.array([Plaintext.literal("field", i) for i in range(3)])),
    ])
    fields = pt.to_fields()
    back = plaintext_from_fields(fields)
    assert back == pt
