"""In-circuit Request verification (circuit/program/src/request/verify.rs
mirror for the supported input kinds).

Checks inside the transition circuit:
  1. tcm == hash_psd2([tvk])
  2. input commitments: public/constant inputs re-hashed in-circuit
     (hash_psd8([fid, fields.., tcm, index]))
  3. Schnorr: g_r = G*response + pk_sig*challenge (constant-base +
     variable-base Edwards scalar muls over gadgets), then
     challenge' = hash_to_scalar_psd8([g_r.x, pk_sig.x, pr_sig.x,
     signer.x, tvk, tcm, fid, is_root] ++ input_hashes) == challenge.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..curves import edwards as ed
from ..console import network as N
from ..console.request import Request, compute_function_id
from .builder import CircuitBuilder, LinearCombination, PUBLIC, PRIVATE
from .types import CField, CBool, CGroup
from . import poseidon_gadget

R = P.R
S = P.S
SCALAR_BITS = 251


def g_scalar_multiply_gadget(builder, scalar_bits):
    """Constant-base scalar mul over the account bases (mainnet GENERATOR_G):
    sum of bit-conditioned constant points via complete adds + ternaries."""
    bases = N.generator_g()
    acc = CGroup.constant(builder, ed.IDENTITY_AFFINE)
    for i, bit in enumerate(scalar_bits[:SCALAR_BITS]):
        base = CGroup.constant(builder, ed.to_affine(bases[i]))
        added = acc + base
        nx = added.x.ternary(bit, acc.x)
        ny = added.y.ternary(bit, acc.y)
        acc = CGroup(builder, nx, ny)
    return acc


def var_scalar_multiply_gadget(builder, point: CGroup, scalar_bits):
    """Variable-base double-and-add."""
    return point.mul_bits(list(scalar_bits[:SCALAR_BITS]))


def scalar_to_bits_gadget(builder, value: int):
    """Inject a scalar as SCALAR_BITS private bits + return (bits, field LC)."""
    bits = [CBool.new(builder, PRIVATE, (value >> i) & 1) for i in range(SCALAR_BITS)]
    acc = LinearCombination(0)
    coeff = 1
    for b in bits:
        acc = acc.add(b.lc, coeff)
        coeff = coeff * 2 % R
    return bits, CField(builder, acc)


def hash_to_scalar_bits_gadget(builder, rate, inputs):
    """hash_psd{rate} -> field -> low 250 bits (from_field_lossy)."""
    out = poseidon_gadget.hash_psd(builder, rate, inputs)[0]
    bits = out.to_bits_le(253)
    return bits[:250]


def verify_request_gadget(builder: CircuitBuilder, request: Request, input_types,
                          input_gadgets, is_root: bool = True,
                          return_tvk: bool = False):
    """input_gadgets: per input, the list of CField gadgets of its fields
    (already injected; bound to the function body registers by the caller).
    Returns the public tcm CField. Raises on inconsistent witness."""
    fid_const = compute_function_id(request.network_id, request.program_id,
                                    request.function_name)
    fid = CField.constant(builder, fid_const)
    tvk = CField.new(builder, PRIVATE, request.tvk)
    tcm = CField.new(builder, PUBLIC, request.tcm)
    # 1. tcm = H2([tvk])
    tcm_check = poseidon_gadget.hash_psd(builder, 2, [tvk])[0]
    tcm.assert_eq(tcm_check)

    signer = CGroup.new(builder, PRIVATE, request.signer)
    pk_sig = CGroup.new(builder, PRIVATE, request.signature.compute_key.pk_sig)
    pr_sig = CGroup.new(builder, PRIVATE, request.signature.compute_key.pr_sig)

    # 2. input commitments
    input_hashes = []
    for index, ((vis, _name), gadgets, iid) in enumerate(
            zip(input_types, input_gadgets, request.input_ids)):
        if vis in ("public", "constant"):
            preimage = [fid] + list(gadgets) + [tcm, CField.constant(builder, index)]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
            pub = CField.new(builder, PUBLIC, iid.fields[0])
            h.assert_eq(pub)
            input_hashes.append(h)
        elif vis == "private":
            # ivk = H4([fid, tvk, index]); ct_i = f_i + H8-stream; hash ct
            ivk = poseidon_gadget.hash_psd(
                builder, 4, [fid, tvk, CField.constant(builder, index)])[0]
            n = len(gadgets)
            randomizers = poseidon_gadget.hash_psd(
                builder, 8,
                [CField.constant(builder, N.ENCRYPTION_DOMAIN), ivk], num_outputs=n)
            ct = [g + r for g, r in zip(gadgets, randomizers)]
            h = poseidon_gadget.hash_psd(builder, 8, ct)[0]
            pub = CField.new(builder, PUBLIC, iid.fields[0])
            h.assert_eq(pub)
            input_hashes.append(h)
        else:
            raise NotImplementedError(f"in-circuit input kind {vis} (round-2)")

    # 3. Schnorr
    resp_bits, _ = scalar_to_bits_gadget(builder, request.signature.response)
    chal_bits, chal_field = scalar_to_bits_gadget(builder, request.signature.challenge)
    g_resp = g_scalar_multiply_gadget(builder, resp_bits)
    pk_chal = var_scalar_multiply_gadget(builder, pk_sig, chal_bits)
    g_r = g_resp + pk_chal

    msg = [g_r.x, pk_sig.x, pr_sig.x, signer.x, tvk, tcm, fid,
           CField.constant(builder, 1 if is_root else 0)] + input_hashes
    cand_bits = hash_to_scalar_bits_gadget(builder, 8, msg)
    # challenge == candidate (compare the 250 truncated bits)
    acc = LinearCombination(0)
    coeff = 1
    for b in cand_bits:
        acc = acc.add(b.lc, coeff)
        coeff = coeff * 2 % R
    CField(builder, acc).assert_eq(chal_field)
    return (tcm, tvk) if return_tvk else tcm
