"""Aleo account scheme: Schnorr keys over Edwards-BLS12 (console/account/).

PrivateKey{seed, sk_sig, r_sig}, ComputeKey{pk_sig, pr_sig, sk_prf},
ViewKey, Address; sign/verify with Poseidon8 hash-to-scalar challenges.
Derivations mirror console/account/src/*/try_from.rs exactly.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..params import bls12_377 as P
from ..curves import edwards as ed
from . import network as N

R = P.R
S = P.S

_SK_SIG_DOMAIN = "AleoAccountSignatureSecretKey0"
_R_SIG_DOMAIN = "AleoAccountSignatureRandomizer0"


@dataclass(frozen=True)
class ComputeKey:
    pk_sig: tuple
    pr_sig: tuple
    sk_prf: int

    @classmethod
    def from_private_key(cls, sk: "PrivateKey"):
        pk_sig = N.g_scalar_multiply(sk.sk_sig)
        pr_sig = N.g_scalar_multiply(sk.r_sig)
        sk_prf = N.hash_to_scalar_psd(4, [pk_sig[0], pr_sig[0]])
        return cls(pk_sig, pr_sig, sk_prf)

    def to_address(self) -> tuple:
        pk_prf = N.g_scalar_multiply(self.sk_prf)
        return ed.add(ed.add(self.pk_sig, self.pr_sig), pk_prf)


@dataclass(frozen=True)
class PrivateKey:
    seed: int
    sk_sig: int
    r_sig: int

    @classmethod
    def from_seed(cls, seed: int):
        seed %= R
        sk_sig = N.hash_to_scalar_psd(2, [N.domain_separator(_SK_SIG_DOMAIN), seed])
        r_sig = N.hash_to_scalar_psd(2, [N.domain_separator(f"{_R_SIG_DOMAIN}.0"), seed])
        return cls(seed, sk_sig, r_sig)

    @classmethod
    def new(cls, rng):
        return cls.from_seed(rng.randrange(R))

    def compute_key(self) -> ComputeKey:
        return ComputeKey.from_private_key(self)

    def to_address(self) -> tuple:
        return self.compute_key().to_address()

    def to_view_key(self) -> int:
        """ViewKey = sk_sig + r_sig + sk_prf (mod scalar field)."""
        ck = self.compute_key()
        return (self.sk_sig + self.r_sig + ck.sk_prf) % S


@dataclass(frozen=True)
class Signature:
    challenge: int
    response: int
    compute_key: ComputeKey

    @classmethod
    def sign(cls, private_key: PrivateKey, message_fields, rng) -> "Signature":
        """signature/sign.rs:20 — challenge over [g_r, pk_sig, pr_sig, addr].x ++ msg."""
        nonce = rng.randrange(S)
        g_r = N.g_scalar_multiply(nonce)
        ck = private_key.compute_key()
        address = ck.to_address()
        preimage = [g_r[0], ck.pk_sig[0], ck.pr_sig[0], address[0]] + list(message_fields)
        challenge = N.hash_to_scalar_psd(8, preimage)
        response = (nonce - challenge * private_key.sk_sig) % S
        return cls(challenge, response, ck)

    def verify(self, address: tuple, message_fields) -> bool:
        g_r = ed.add(
            N.g_scalar_multiply(self.response),
            ed.mul(self.compute_key.pk_sig, self.challenge % S),
        )
        preimage = [g_r[0], self.compute_key.pk_sig[0], self.compute_key.pr_sig[0],
                    address[0]] + list(message_fields)
        candidate = N.hash_to_scalar_psd(8, preimage)
        return self.challenge == candidate and self.compute_key.to_address() == address
