"""Request: a signed function call (console/program/src/request/).

sign (request/sign.rs:20): nonce r = hash_to_scalar_psd4([SN_DOMAIN,
sk_sig, nonce_field]); tvk = (signer * r).x; tcm = hash_psd2([tvk]);
scm = hash_psd2([signer.x, root_tvk]); challenge = hash_to_scalar_psd8
over [g_r, pk_sig, pr_sig, signer].x ++ [tvk, tcm, function_id, is_root]
++ per-input commitments; response = r - challenge * sk_sig.

verify (request/verify.rs): recompute g_r = g*response + pk_sig*challenge
and check the challenge + input ids.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..params import bls12_377 as P
from ..curves import edwards as ed
from . import network as N
from .account import PrivateKey, ComputeKey, Signature
from .types import Plaintext, Identifier, int_to_bits_le, bytes_to_bits_le
from .record import Record, serial_number_from_gamma, record_tag

R = P.R
S = P.S


def compute_function_id(network_id: int, program_id: str, function_name: str) -> int:
    """hash_bhp1024 over (u16 network, u8 len + name, u8 len + network suffix,
    u8 len + function) bits (function_id/mod.rs:23)."""
    name, _, suffix = program_id.partition(".")
    bits = int_to_bits_le(network_id, 16)
    for part in (name, suffix, function_name):
        part_bits = bytes_to_bits_le(part.encode())
        bits += int_to_bits_le(len(part_bits), 8)
        bits += part_bits
    return N.hash_bhp(1024, bits)


def graph_key_sk_tag(view_key: int) -> int:
    return N.hash_psd(4, [N.GRAPH_KEY_DOMAIN, view_key % R, 0])


def encrypt_plaintext_symmetric(pt: Plaintext, view_key_field: int):
    """Plaintext -> ciphertext fields (plaintext/encrypt.rs:28)."""
    fields = pt.to_fields()
    randomizers = N.hash_many_psd(8, [N.ENCRYPTION_DOMAIN, view_key_field], len(fields))
    return [(f + r) % R for f, r in zip(fields, randomizers)]


@dataclass
class InputID:
    kind: str          # constant | public | private | record | external_record
    fields: tuple      # commitment fields (record: (commitment, gamma_x, serial_number, tag))


@dataclass
class Request:
    signer: tuple
    network_id: int
    program_id: str
    function_name: str
    input_ids: list
    inputs: list
    signature: Signature
    sk_tag: int
    tvk: int
    tcm: int
    scm: int

    @classmethod
    def sign(cls, private_key: PrivateKey, program_id: str, function_name: str,
             inputs, input_types, rng, root_tvk: int | None = None, is_root: bool = True):
        """inputs: list of Plaintext or Record; input_types: list of
        ('constant'|'public'|'private'|'record'|'external_record', name)."""
        sk_sig = private_key.sk_sig
        ck = private_key.compute_key()
        view_key = private_key.to_view_key()
        sk_tag = graph_key_sk_tag(view_key)

        nonce = rng.randrange(R)
        r = N.hash_to_scalar_psd(4, [N.SERIAL_NUMBER_DOMAIN, sk_sig % R, nonce])
        g_r = N.g_scalar_multiply(r)
        signer = ck.to_address()
        tvk = ed.mul(signer, r % S)[0]
        tcm = N.hash_psd(2, [tvk])
        root_tvk = tvk if root_tvk is None else root_tvk
        scm = N.hash_psd(2, [signer[0], root_tvk])
        function_id = compute_function_id(N.ID, program_id, function_name)

        message = [g_r[0], ck.pk_sig[0], ck.pr_sig[0], signer[0],
                   tvk, tcm, function_id, 1 if is_root else 0]
        input_ids = []
        for index, (inp, (vis, _name)) in enumerate(zip(inputs, input_types)):
            if vis in ("constant", "public"):
                preimage = [function_id] + inp.to_fields() + [tcm, index]
                h = N.hash_psd(8, preimage)
                message.append(h)
                input_ids.append(InputID(vis, (h,)))
            elif vis == "private":
                ivk = N.hash_psd(4, [function_id, tvk, index])
                ct = encrypt_plaintext_symmetric(inp, ivk)
                h = N.hash_psd(8, ct)
                message.append(h)
                input_ids.append(InputID(vis, (h,)))
            elif vis == "record":
                assert isinstance(inp, Record)
                if inp.owner != signer:
                    from ..synthesizer.interpreter import HaltError
                    raise HaltError(
                        f"Input record for '{program_id}' must belong to "
                        f"the signer")
                commitment = inp.to_commitment(program_id, _name)
                h = N.hash_to_group_psd(2, [N.SERIAL_NUMBER_DOMAIN, commitment])
                h_r = ed.mul(h, r % S)
                gamma = ed.mul(h, sk_sig % S)
                sn = serial_number_from_gamma(gamma, commitment)
                tag = record_tag(sk_tag, commitment)
                message += [h[0], h_r[0], gamma[0], tag]
                input_ids.append(InputID(vis, (commitment, gamma, sn, tag)))
            elif vis == "external_record":
                preimage = [function_id] + inp.to_fields() + [tvk, index]
                h = N.hash_psd(8, preimage)
                message.append(h)
                input_ids.append(InputID(vis, (h,)))
            else:
                raise ValueError(f"invalid input type {vis}")

        challenge = N.hash_to_scalar_psd(8, message)
        response = (r - challenge * sk_sig) % S
        return cls(signer, N.ID, program_id, function_name, input_ids, list(inputs),
                   Signature(challenge, response, ck), sk_tag, tvk, tcm, scm)

    def verify(self, input_types, is_root: bool = True) -> bool:
        """Console-side verification (request/verify.rs behavior)."""
        if self.network_id != N.ID:
            # the reference halts on construction (request/mod.rs:88);
            # the console verifier therefore never accepts a foreign network
            return False
        ck = self.signature.compute_key
        challenge, response = self.signature.challenge, self.signature.response
        if ck.to_address() != self.signer:
            return False
        g_r = ed.add(N.g_scalar_multiply(response), ed.mul(ck.pk_sig, challenge % S))
        tvk_check = self.tcm == N.hash_psd(2, [self.tvk])
        if not tvk_check:
            return False
        function_id = compute_function_id(self.network_id, self.program_id, self.function_name)
        message = [g_r[0], ck.pk_sig[0], ck.pr_sig[0], self.signer[0],
                   self.tvk, self.tcm, function_id, 1 if is_root else 0]
        for index, (inp, iid, (vis, _name)) in enumerate(zip(self.inputs, self.input_ids, input_types)):
            if vis in ("constant", "public"):
                preimage = [function_id] + inp.to_fields() + [self.tcm, index]
                if N.hash_psd(8, preimage) != iid.fields[0]:
                    return False
                message.append(iid.fields[0])
            elif vis == "private":
                message.append(iid.fields[0])
            elif vis == "record":
                commitment, gamma, sn, tag = iid.fields
                if serial_number_from_gamma(gamma, commitment) != sn:
                    return False
                h = N.hash_to_group_psd(2, [N.SERIAL_NUMBER_DOMAIN, commitment])
                # h_r = h*r = h*(response + challenge*sk_sig) = h*response + gamma*challenge
                h_r = ed.add(ed.mul(h, response % S), ed.mul(gamma, challenge % S))
                message += [h[0], h_r[0], gamma[0], tag]
            elif vis == "external_record":
                message.append(iid.fields[0])
        return N.hash_to_scalar_psd(8, message) == challenge


# ---------------------------------------------------------------------------
# Response: output IDs (console/program/src/response/mod.rs:32)
# ---------------------------------------------------------------------------

@dataclass
class OutputID:
    kind: str       # constant | public | private | record | external_record | future
    fields: tuple


@dataclass
class Response:
    output_ids: list
    outputs: list

    @classmethod
    def new(cls, network_id: int, program_id: str, function_name: str,
            num_inputs: int, tvk: int, tcm: int, outputs, output_types):
        """outputs: list of Plaintext/Record/future tuples; output_types:
        [(visibility, type_name)]."""
        function_id = compute_function_id(network_id, program_id, function_name)
        output_ids = []
        for index, (output, (vis, _name)) in enumerate(zip(outputs, output_types)):
            idx = num_inputs + index
            if vis in ("constant", "public"):
                preimage = [function_id] + output.to_fields() + [tcm, idx]
                output_ids.append(OutputID(vis, (N.hash_psd(8, preimage),)))
            elif vis == "private":
                ovk = N.hash_psd(4, [function_id, tvk, idx])
                ct = encrypt_plaintext_symmetric(output, ovk)
                output_ids.append(OutputID(vis, (N.hash_psd(8, ct),)))
            elif vis == "record":
                assert isinstance(output, Record)
                commitment = output.to_commitment(program_id, _name)
                # checksum = hash of the encrypted record fields
                output_ids.append(OutputID(vis, (commitment, 0)))
            elif vis == "external_record":
                preimage = [function_id] + output.to_fields() + [tvk, idx]
                output_ids.append(OutputID(vis, (N.hash_psd(8, preimage),)))
            elif vis == "future":
                # response/mod.rs OutputID::Future: hash over
                # (function ID || future fields || tcm || index)
                from .types import future_from_value
                preimage = ([function_id] + future_from_value(output).to_fields()
                            + [tcm, idx])
                output_ids.append(OutputID(vis, (N.hash_psd(8, preimage),)))
            else:
                raise ValueError(f"invalid output type {vis}")
        return cls(output_ids, list(outputs))
