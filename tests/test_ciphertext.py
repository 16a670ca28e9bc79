"""Console Ciphertext type (console/program/src/data/ciphertext/):
encrypt/decrypt round trips, wire bytes, bech32m text form."""
import random

import pytest

from snarkvm_tpu.console.ciphertext import Ciphertext
from snarkvm_tpu.console.types import Plaintext, Literal, Identifier
from snarkvm_tpu.console.account import PrivateKey
from snarkvm_tpu.curves import edwards as ed
from snarkvm_tpu.params import bls12_377 as P


@pytest.fixture(scope="module")
def keys():
    rng = random.Random(0xC1)
    sk = PrivateKey.new(rng)
    return sk, sk.to_view_key(), sk.to_address(), rng


def _sample_plaintexts():
    return [
        Plaintext.literal("field", 12345),
        Plaintext.literal("u64", 2**63 - 1),
        Plaintext.literal("boolean", True),
        Plaintext.struct([("a", Plaintext.literal("u8", 7)),
                          ("b", Plaintext.literal("field", 9))]),
        Plaintext.array([Plaintext.literal("u32", i) for i in range(3)]),
    ]


class TestCrypto:
    def test_encrypt_decrypt_round_trip(self, keys):
        sk, vk, addr, rng = keys
        for pt in _sample_plaintexts():
            r = rng.randrange(1, P.S)
            from snarkvm_tpu.console import network as N
            nonce = N.g_scalar_multiply(r)         # r*G, the public nonce
            ct = Ciphertext.encrypt(pt, addr, r)
            back = ct.decrypt(vk, nonce)
            assert back == pt
            # wrong key decrypts to garbage or fails
            other = PrivateKey.from_seed(99).to_view_key()
            try:
                assert ct.decrypt(other, nonce) != pt
            except Exception:
                pass

    def test_symmetric_matches_request_encryption(self, keys):
        # the request input encryption uses the same symmetric primitive
        from snarkvm_tpu.console.request import encrypt_plaintext_symmetric
        sk, vk, addr, rng = keys
        pt = Plaintext.literal("field", 77)
        pvk = 123456789
        ct = Ciphertext.encrypt_symmetric(pt, pvk)
        assert list(ct.fields) == encrypt_plaintext_symmetric(pt, pvk)
        assert ct.decrypt_symmetric(pvk) == pt


class TestWire:
    def test_bytes_round_trip(self, keys):
        sk, vk, addr, rng = keys
        ct = Ciphertext.encrypt_symmetric(Plaintext.literal("u128", 2**100), 5)
        data = ct.to_bytes_le()
        assert Ciphertext.from_bytes_le(data) == ct

    def test_text_round_trip(self):
        ct = Ciphertext.encrypt_symmetric(Plaintext.literal("field", 3), 9)
        s = str(ct)
        assert s.startswith("ciphertext1")
        assert Ciphertext.from_str(s) == ct

    def test_bad_prefix_rejected(self):
        ct = Ciphertext.encrypt_symmetric(Plaintext.literal("field", 3), 9)
        from snarkvm_tpu.utils.encoding import bech32m_encode
        bad = bech32m_encode("record", ct.to_bytes_le())
        with pytest.raises(AssertionError):
            Ciphertext.from_str(bad)
