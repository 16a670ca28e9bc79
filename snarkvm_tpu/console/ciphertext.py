"""Console Ciphertext — console/program/src/data/ciphertext/: a vector of
field elements produced by one-time-pad encryption of a Plaintext under a
Poseidon8-derived key stream, displayed as bech32m `ciphertext1...`.

Encryption (plaintext/encrypt.rs): plaintext view key = (address *
randomizer).x; randomizers = HashMany_psd8([ENCRYPTION_DOMAIN, pvk], n);
ciphertext fields = plaintext fields + randomizers. Decryption
(ciphertext/decrypt.rs): pvk = (nonce * view_key).x, subtract.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..params import bls12_377 as P
from ..curves import edwards as ed
from . import network as N
from .types import Plaintext
from .record import plaintext_from_fields
from ..utils.encoding import bech32m_encode, bech32m_decode

R = P.R


@dataclass(frozen=True)
class Ciphertext:
    fields: tuple

    # ---- wire form (ciphertext/bytes.rs): u16 count + 32-byte LE fields --
    def to_bytes_le(self) -> bytes:
        assert len(self.fields) <= N.MAX_DATA_SIZE_IN_FIELDS
        out = len(self.fields).to_bytes(2, "little")
        for f in self.fields:
            out += (f % R).to_bytes(32, "little")
        return out

    @classmethod
    def from_bytes_le(cls, data: bytes) -> "Ciphertext":
        n = int.from_bytes(data[:2], "little")
        assert n <= N.MAX_DATA_SIZE_IN_FIELDS, "ciphertext too large"
        assert len(data) == 2 + 32 * n, "ciphertext length mismatch"
        fields = tuple(int.from_bytes(data[2 + 32 * i : 2 + 32 * (i + 1)],
                                      "little") for i in range(n))
        assert all(f < R for f in fields), "ciphertext field out of range"
        return cls(fields)

    # ---- text form (ciphertext/parse.rs): bech32m over the wire bytes ---
    def __str__(self) -> str:
        return bech32m_encode("ciphertext", self.to_bytes_le())

    @classmethod
    def from_str(cls, s: str) -> "Ciphertext":
        hrp, data = bech32m_decode(s.replace("_", ""))
        assert hrp == "ciphertext", f"invalid ciphertext prefix {hrp!r}"
        return cls.from_bytes_le(data)

    # ---- crypto ---------------------------------------------------------
    @classmethod
    def encrypt(cls, plaintext: Plaintext, address, randomizer: int) -> "Ciphertext":
        """plaintext/encrypt.rs: pvk = (address * randomizer).x."""
        pvk = ed.mul(address, randomizer % P.S)[0]
        return cls.encrypt_symmetric(plaintext, pvk)

    @classmethod
    def encrypt_symmetric(cls, plaintext: Plaintext, plaintext_view_key: int) -> "Ciphertext":
        fields = plaintext.to_fields()
        randomizers = N.hash_many_psd(
            8, [N.ENCRYPTION_DOMAIN, plaintext_view_key % R], len(fields))
        return cls(tuple((f + r) % R for f, r in zip(fields, randomizers)))

    def decrypt(self, view_key: int, nonce) -> Plaintext:
        """ciphertext/decrypt.rs: pvk = (nonce * view_key).x."""
        pvk = ed.mul(nonce, view_key % P.S)[0]
        return self.decrypt_symmetric(pvk)

    def decrypt_symmetric(self, plaintext_view_key: int) -> Plaintext:
        randomizers = N.hash_many_psd(
            8, [N.ENCRYPTION_DOMAIN, plaintext_view_key % R], len(self.fields))
        fields = [(f - r) % R for f, r in zip(self.fields, randomizers)]
        return plaintext_from_fields(fields)

    def size_in_fields(self) -> int:
        return len(self.fields)

    def to_bits_le(self):
        from .types import int_to_bits_le
        bits = int_to_bits_le(len(self.fields), 16)
        for f in self.fields:
            bits += int_to_bits_le(f % R, 253)
        return bits
